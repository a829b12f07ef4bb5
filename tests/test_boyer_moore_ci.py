"""Case-insensitive Boyer-Moore tests, porting
`tests/Data/Text/BoyerMooreCISpec.hs`."""

import numpy as np
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


class TestClassicSkipTables:
    """The genuine backwards skip-table machinery
    (BoyerMooreCI/Automaton.hs:266-477), round 2."""

    def test_suffix_table_worked_example(self):
        # The reference's documented `ababa` walk-through
        # (Automaton.hs:300-310): init1 gives [2,2,4,4,5], the final write
        # sets the last position to 1.
        from alfred_margaret_tpu.boyer_moore_ci.automaton import build_suffix_table

        cps = tuple(ord(c) for c in "ababa")
        assert build_suffix_table(cps) == [2, 2, 4, 4, 1]

    def test_substring_is_suffix_examples(self):
        # Automaton.hs:366-374 doc examples.
        from alfred_margaret_tpu.boyer_moore_ci.automaton import _substring_is_suffix

        ab = tuple(ord(c) for c in "ababa")
        assert all(_substring_is_suffix(ab, p) is None for p in range(5))
        ba = tuple(ord(c) for c in "baba")
        assert _substring_is_suffix(ba, 0) is None
        assert _substring_is_suffix(ba, 1) is None
        s = tuple(ord(c) for c in "abaacbbaac")
        assert _substring_is_suffix(s, 4) == 4
        s2 = tuple(ord(c) for c in "abaacaabcbaac")
        assert _substring_is_suffix(s2, 4) == 4
        assert _substring_is_suffix(s2, 8) == 1

    def test_bad_char_table(self):
        from alfred_margaret_tpu.boyer_moore_ci.automaton import build_bad_char

        cps = tuple(ord(c) for c in "adcd")
        table, spill, default = build_bad_char(cps)
        assert default == 4
        assert table[ord("a")] == 3  # bytes remaining after 'a'
        assert table[ord("d")] == 2  # rightmost non-final 'd' (index 1)
        assert table[ord("c")] == 1
        assert table[ord("z")] == 4  # absent characters skip the whole pattern
        cps2 = tuple(ord(c) for c in "aд💩x")  # cp >= 256 spill entries
        t2, sp2, d2 = build_bad_char(cps2)
        assert ord("д") in sp2 and ord("💩") in sp2

    def test_classic_equals_default_engine(self):
        from alfred_margaret_tpu.boyer_moore_ci.automaton import (
            build_automaton, matches, matches_classic,
        )

        rng = np.random.default_rng(31)
        alphabet = list("abAB12ßẞİiKkÅå") + ["д", "Д", "ⱥ", "Ⱥ", "ⱦ", "Ⱦ", "💩", "𝄞"]
        for trial in range(60):
            nlen = int(rng.integers(1, 5))
            needle = "".join(rng.choice(alphabet, size=nlen))
            from alfred_margaret_tpu.utils import utf8 as u8

            needle = u8.lower_str(needle)  # patterns are lowercase
            hay = "".join(rng.choice(alphabet, size=int(rng.integers(0, 60))))
            a = build_automaton(needle)
            assert matches_classic(a, hay) == matches(a, hay), (needle, hay)

    def test_classic_goldens(self):
        from alfred_margaret_tpu.boyer_moore_ci.automaton import (
            build_automaton, matches_classic,
        )

        # Cyrillic byte positions (2-byte cps; BoyerMooreCISpec.hs:52-67).
        a = build_automaton("дом")
        got = matches_classic(a, "ДОМ дом Дом")
        assert got == [(0, 5), (7, 12), (14, 19)]
        # ⱥ shrinking-byte-length variants (BoyerMooreCISpec.hs:79-87):
        # haystack Ⱥ is 2 bytes while pattern ⱥ is 3.
        a2 = build_automaton("ⱥb")
        assert matches_classic(a2, "Ⱥb xⱥb") == [(0, 2), (5, 8)]
        # Non-overlap: the second "aa" starts after the first match ends.
        a3 = build_automaton("aa")
        assert matches_classic(a3, "aaaa") == [(0, 1), (2, 3)]
        # Early exit (Done).
        from alfred_margaret_tpu.boyer_moore_ci.automaton import run_text_classic
        from alfred_margaret_tpu.models.ac import Done

        hits = []

        def first(acc, frm, to):
            hits.append((frm, to))
            return Done(acc)

        run_text_classic(None, first, a3, "aaaa")
        assert hits == [(0, 1)]

    def test_classic_invalid_bytes(self):
        from alfred_margaret_tpu.boyer_moore_ci.automaton import (
            build_automaton, matches, matches_classic,
        )

        a = build_automaton("ab")
        hay = b"\xffab \x80ab \xc2ab \xe0\x80ab"
        assert matches_classic(a, hay) == matches(a, hay)
