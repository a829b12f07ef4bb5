"""Case-insensitive Boyer-Moore tests, porting
`tests/Data/Text/BoyerMooreCISpec.hs`."""

from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu import IGNORE_CASE, Replacer
from alfred_margaret_tpu.boyer_moore_ci import (
    Searcher,
    automaton as bmci_mod,
    build_automaton,
    minimum_skip_for_code_point,
    replace_single_limited,
)
from alfred_margaret_tpu.utils import utf8


def match_positions(needle: str, haystack: str):
    return bmci_mod.matches(build_automaton(needle), haystack)


def match_texts(needle: str, haystack: str):
    hay = haystack.encode()
    return [hay[frm : to + 1].decode("utf-8") for frm, to in match_positions(needle, haystack)]


class TestRunText:
    def test_basic(self):
        assert match_positions("abc", "ABCA") == [(0, 2)]
        assert match_positions("bc", "abca") == [(1, 2)]
        assert match_positions("bc", "ABCA") == [(1, 2)]

    def test_no_overlapping(self):
        assert match_positions("aba", "abababa") == [(0, 2), (4, 6)]
        assert match_positions("aba", "ABaBaBA") == [(0, 2), (4, 6)]

    def test_uppercase_needles_dont_match(self):
        assert match_positions("A", "aaaa") == []
        assert match_positions("A", "AAAA") == []

    def test_cyrillic(self):
        assert match_positions("п", "ипсум") == [(2, 3)]
        assert match_positions("п", "ИПСУМ") == [(2, 3)]
        assert match_positions("лорем", "Лорем") == [(0, 9)]
        assert match_texts("лорем", "Лорем") == ["Лорем"]
        assert match_positions("лорем", "ЛОРЕМ") == [(0, 9)]
        assert match_texts("лорем", "ЛОРЕМ") == ["ЛОРЕМ"]
        assert match_texts("сит", "итсит") == ["сит"]
        assert match_texts("сит", "ИТСИТ") == ["СИТ"]

    def test_mixed_byte_lengths(self):
        assert match_texts("сит", "Лор сит амет") == ["сит"]
        assert match_texts("сит", "Лорем ипсум долор сит амет") == ["сит"]
        assert match_texts("сит", "ЛОРЕМ ИПСУМ ДОЛОР СИТ АМЕТ") == ["СИТ"]
        zoo = "ЛОРЕМab\U0001d11e\U0001f4a9\U0001d11eДОЛab\U0001f4a9baåÅÅ\U0001d11e\U0001d11eßẞ"
        assert match_texts("\U0001f4a9b", zoo) == ["\U0001f4a9b"]
        assert match_texts("\U0001d11e", zoo) == ["\U0001d11e"] * 4
        assert match_texts("a", zoo) == ["a"] * 3

    def test_shrinking_case_variants(self):
        # ⱥ/ⱦ are 3 UTF-8 bytes with 2-byte unlowerings Ⱥ/Ⱦ.
        assert match_positions("ⱥⱦⱥⱦⱥⱦ", "ⱥⱦⱥⱦⱥⱦ") == [(0, 17)]
        assert match_texts("ⱥⱦⱥⱦⱥⱦ", "ⱥⱦⱥⱦⱥⱦ") == ["ⱥⱦⱥⱦⱥⱦ"]
        assert match_positions("ⱥⱦⱥⱦⱥⱦ", "ȺȾȺȾȺȾ") == [(0, 11)]
        assert match_texts("ⱥⱦⱥⱦⱥⱦ", "ȺȾȺȾȺȾ") == ["ȺȾȺȾȺȾ"]
        assert match_positions("ⱥⱦⱥⱦⱥⱦ", "ȺⱦⱥȾⱥȾ") == [(0, 14)]
        assert match_texts("ⱥⱦⱥⱦⱥⱦ", "ȺⱦⱥȾⱥȾ") == ["ȺⱦⱥȾⱥȾ"]

    def test_needle_equals_haystack(self):
        for n in range(1, 129):
            t = "a" * n
            assert match_positions(t, t) == [(0, n - 1)]

    @given(st.text(alphabet="aAБВ\U0001d11e\U0001f4a9ßẞÅå", min_size=1, max_size=10))
    @settings(max_examples=200, deadline=None)
    def test_needle_is_lowered_haystack(self, text):
        needle = utf8.lower_str(text)
        assert match_positions(needle, text) == [(0, len(text.encode()) - 1)]

    def test_gross(self):
        assert match_texts("groß", "Großfräsmaschinenöffnungstür") == ["Groß"]
        assert match_texts("groß", "GROẞFRÄSMASCHINENÖFFNUNGSTÜR") == ["GROẞ"]
        assert match_texts("öffnung", "Großfräsmaschinenöffnungstür") == ["öffnung"]
        assert match_texts("öffnung", "GROẞFRÄSMASCHINENÖFFNUNGSTÜR") == ["ÖFFNUNG"]


class TestMinimumSkip:
    def test_docstring_values(self):
        assert minimum_skip_for_code_point(ord("a")) == 1
        assert minimum_skip_for_code_point(ord("д")) == 2
        assert minimum_skip_for_code_point(ord("ⓟ")) == 3
        assert minimum_skip_for_code_point(ord("\U0001f384")) == 4
        assert minimum_skip_for_code_point(0x2C65) == 2  # ⱥ
        assert minimum_skip_for_code_point(0x2C66) == 2  # ⱦ

    def test_reference_implementation_full_unicode(self):
        # Port of the brute-force check over all code points
        # (BoyerMooreCISpec.hs:115-118,166-175); sample densely over the BMP
        # plus the known specials rather than all 1.1M cps for test speed.
        import numpy as np

        cps = list(range(0x3000)) + [0x1E9E, 0x212A, 0x212B, 0x2C65, 0x2C66, 0x2C6F, 0x10400]
        for cp in cps:
            variants = utf8.unlower_code_point(chr(cp))
            if not variants:
                expected = utf8.num_code_units(cp)
            else:
                expected = min(utf8.num_code_units(ord(u)) for u in variants)
            assert minimum_skip_for_code_point(cp) == expected


class TestSearcher:
    @given(st.lists(st.text(max_size=3), max_size=4), st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_contains_any_equiv(self, needles, haystack):
        lneedles = [utf8.lower_str(n) for n in needles]
        searcher = Searcher.build(lneedles)
        lhay = utf8.lower_str(haystack)
        expected = any(n and n in lhay for n in lneedles)
        assert searcher.contains_any(haystack) is expected

    @given(st.lists(st.text(max_size=3), max_size=4), st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_contains_all_equiv(self, needles, haystack):
        lneedles = [utf8.lower_str(n) for n in needles]
        searcher = Searcher.build_needle_id_searcher(lneedles)
        lhay = utf8.lower_str(haystack)
        expected = all(n and n in lhay for n in lneedles)
        assert searcher.contains_all(haystack) is expected


@st.composite
def needle_haystack(draw):
    alphabet = draw(st.sampled_from(["abAB12", "aAБВ\U0001d11e\U0001f4a9ßẞÅå", "ȺⱥȾⱦiİ"]))
    fragments = draw(st.lists(st.text(alphabet=alphabet, min_size=1, max_size=3), min_size=1, max_size=4))
    frag = st.sampled_from(fragments)
    needle = draw(st.builds("".join, st.lists(frag, min_size=1, max_size=2)))
    haystack = draw(st.builds("".join, st.lists(frag, max_size=15)))
    return needle, haystack


class TestReplacer:
    @given(needle_haystack(), st.text(max_size=4))
    @settings(max_examples=300, deadline=None)
    def test_equivalent_to_ac_replacer_single_needle(self, nh, replacement):
        needle, haystack = nh
        lneedle = utf8.lower_str(needle)
        expected = Replacer.build(IGNORE_CASE, [(lneedle, replacement)]).run(haystack)
        auto = build_automaton(lneedle)
        assert replace_single_limited(auto, replacement, haystack) == expected
