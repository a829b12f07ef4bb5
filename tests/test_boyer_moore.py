"""Boyer-Moore tests, porting `tests/Data/Text/BoyerMooreSpec.hs`."""

from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu import CASE_SENSITIVE, Replacer
from alfred_margaret_tpu.boyer_moore import (
    Searcher,
    automaton as bm_mod,
    build_automaton,
    pattern_length,
    replace_single_limited,
    run_text,
)
from alfred_margaret_tpu.models.ac import Step


def match_end_positions(needle: str, haystack: str):
    auto = build_automaton(needle)
    starts = bm_mod.matches(auto, haystack)
    return [s + pattern_length(auto) for s in starts]


def naive_match_positions(needle: str, haystack: str):
    """Non-overlapping leftmost end positions via bytes.find."""
    nb, hb = needle.encode(), haystack.encode()
    out, start = [], 0
    if not nb:
        return out
    while True:
        i = hb.find(nb, start)
        if i < 0:
            return out
        out.append(i + len(nb))
        start = i + len(nb)


# Fragment-pool generator, as in TestInstances.hs:36-56
@st.composite
def needle_haystack(draw):
    alphabet = draw(st.sampled_from(["abAB12", "aAБВ\U0001d11e\U0001f4a9ßẞÅå"]))
    fragments = draw(st.lists(st.text(alphabet=alphabet, min_size=1, max_size=3), min_size=1, max_size=4))
    frag = st.sampled_from(fragments)
    needle = draw(st.builds("".join, st.lists(frag, min_size=1, max_size=2)))
    haystack = draw(st.builds("".join, st.lists(frag, max_size=20)))
    return needle, haystack


class TestRunText:
    def test_needle_equals_haystack_repeated_char(self):
        for n in range(1, 129):
            t = "a" * n
            assert match_end_positions(t, t) == [n]

    def test_needle_equals_haystack_non_bmp(self):
        for t in ["\U000437b8suffix", "aaa\U00057bab" + "aaa\U00017607aa\U000db938aa"]:
            assert match_end_positions(t, t) == [len(t.encode())]

    def test_non_ascii(self):
        assert match_end_positions("eclair", "éclaireclair") == [13]
        assert match_end_positions("éclair", "éclaireclair") == [7]
        assert match_end_positions("éclair", "eclairéclair") == [13]

    def test_complex_characters(self):
        assert match_end_positions("\U0001d11e", "\U0001d11e") == [4]
        woman = "\U0001f574\U0001f3ff‍♀️"
        for needle, end_pos in [(woman, 17), ("\U0001f574\U0001f3ff", 8), ("\U0001f574", 4)]:
            assert match_end_positions(needle, woman) == [end_pos]

    def test_empty_needle_no_match(self):
        assert match_end_positions("", "") == []
        assert match_end_positions("", "foo") == []

    def test_kitchen_sink(self):
        assert match_end_positions('"\x0e]JL"', 'aaaaa"\x0e]JL"') == [11]
        assert match_end_positions('"X]JL"', 'aaaaa"X]JL"') == [11]

    @given(needle_haystack())
    @settings(max_examples=300, deadline=None)
    def test_only_infixes(self, nh):
        needle, haystack = nh
        hay = haystack.encode()
        nb = needle.encode()
        auto = build_automaton(needle)
        for start in bm_mod.matches(auto, haystack):
            assert hay[start : start + len(nb)] == nb

    @given(needle_haystack())
    @settings(max_examples=300, deadline=None)
    def test_all_infixes(self, nh):
        needle, haystack = nh
        assert match_end_positions(needle, haystack) == naive_match_positions(needle, haystack)

    @given(needle_haystack())
    @settings(max_examples=200, deadline=None)
    def test_classic_loop_equals_find_loop(self, nh):
        """The genuine skip-table loop and the find-based fast path must
        report identical match sets (validates the tables)."""
        needle, haystack = nh
        auto = build_automaton(needle)

        def collect(run):
            out = []
            run(out, lambda acc, pos: (acc.append(pos), Step(acc))[1], auto, haystack)
            return out

        assert collect(bm_mod.run_text) == collect(bm_mod.run_text_classic)

    def test_early_exit(self):
        auto = build_automaton("a")
        got = run_text(None, lambda acc, pos: bm_mod.Done(pos), auto, "xxaxa")  # type: ignore[attr-defined]
        assert got == 2


class TestReplacer:
    @given(needle_haystack(), st.text(max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_equivalent_to_ac_replacer_single_needle(self, nh, replacement):
        needle, haystack = nh
        expected = Replacer.build(CASE_SENSITIVE, [(needle, replacement)]).run(haystack)
        auto = build_automaton(needle)
        assert replace_single_limited(auto, replacement, haystack) == expected

    def test_limit(self):
        auto = build_automaton("a")
        assert replace_single_limited(auto, "xxxx", "aa", max_length=8) == "xxxxxxxx"
        assert replace_single_limited(auto, "xxxx", "aa", max_length=7) is None

    def test_empty_needle(self):
        auto = build_automaton("")
        assert replace_single_limited(auto, "r", "") == "r"
        assert replace_single_limited(auto, "r", "keep") == "keep"


class TestSearcher:
    @given(st.lists(st.text(max_size=3), max_size=4), st.text(max_size=30))
    @settings(max_examples=300, deadline=None)
    def test_contains_any_equiv(self, needles, haystack):
        searcher = Searcher.build(needles)
        expected = any(n and n in haystack for n in needles)
        assert searcher.contains_any(haystack) is expected

    @given(st.lists(st.text(max_size=3), max_size=4), st.text(max_size=30))
    @settings(max_examples=300, deadline=None)
    def test_contains_all_equiv(self, needles, haystack):
        searcher = Searcher.build_needle_id_searcher(needles)
        expected = all(n and n in haystack for n in needles)
        assert searcher.contains_all(haystack) is expected

    def test_large_haystack_ac_route(self):
        hay = "x" * 100_000 + "needle" + "y" * 100_000
        s = Searcher.build(["needle", "absent"])
        assert s.contains_any(hay) is True
        assert s.contains_all(hay) is False
        s2 = Searcher.build_needle_id_searcher(["needle", "x", "y"])
        assert s2.contains_all(hay) is True
