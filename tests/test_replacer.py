"""Replacer tests, porting the reference's AhoCorasickSpec Replacer section
(`tests/Data/Text/AhoCorasickSpec.hs:71-163`)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu import CASE_SENSITIVE, IGNORE_CASE, Replacer
from alfred_margaret_tpu.utils import utf8


def replace(replaces, haystack):
    return Replacer.build(CASE_SENSITIVE, replaces).run(haystack)


def replace_ignore_case(replaces, haystack):
    return Replacer.build(IGNORE_CASE, replaces).run(haystack)


class TestReadmeExamples:
    def test_readme(self):
        r = Replacer.build(CASE_SENSITIVE, [("tshirt", "banana"), ("shirt", "pear")])
        assert r.run("tshirts for sale") == "bananas for sale"
        assert r.run("tshirts and shirts for sale") == "bananas and pears for sale"
        assert r.run("sweatshirts and shirtshirts") == "sweabananas and shirbananas"
        assert r.run("sweatshirts and shirttshirts") == "sweabananas and pearbananas"


class TestRun:
    def test_replaces_all_occurrences(self):
        assert replace([("A", "B")], "AXAXB") == "BXBXB"
        assert replace([("A", "B"), ("X", "Y")], "AXAXB") == "BYBYB"
        assert replace([("aaa", ""), ("b", "c")], "aaabaaa") == "c"
        assert replace([("A", "B"), ("Q", "r"), ("Z", "")], "AXAXB") == "BXBXB"

    def test_replaces_only_non_overlapping(self):
        assert replace([("aa", "zz"), ("bb", "w")], "aaabbb") == "zzawb"
        assert replace([("aaa", "")], "aaaaa") == "aa"

    def test_priority_order(self):
        assert replace([("A", ""), ("BBBB", "bingo")], "BBABB") == "bingo"
        assert replace([("BB", ""), ("BBBB", "bingo")], "BBBB") == ""

    def test_surrogate_pair_needle(self):
        assert (
            replace([("\U0001f574", "levitating man in business suit")], "the \U0001f574")
            == "the levitating man in business suit"
        )

    def test_ignore_case(self):
        assert replace_ignore_case([("A", "B")], "AXAXB") == "BXBXB"
        assert replace_ignore_case([("A", "B")], "axaxb") == "BxBxb"
        assert replace_ignore_case([("a", "b")], "AXAXB") == "bXbXB"
        assert replace_ignore_case([("A", "B"), ("X", "Y")], "AXAXB") == "BYBYB"
        assert replace_ignore_case([("A", "B"), ("X", "Y")], "axaxb") == "BYBYb"
        assert replace_ignore_case([("a", "b"), ("x", "y")], "AXAXB") == "bybyB"

    def test_matches_replacements_case_insensitively(self):
        assert replace_ignore_case([("foo", "BAR"), ("bar", "BAZ")], "Foo") == "BAZ"

    def test_non_ascii_case_insensitive(self):
        assert replace_ignore_case([("éclair", "lightning")], "Éclair") == "lightning"
        assert replace_ignore_case([("å", "b")], "åÅÅ") == "bbb"
        assert replace_ignore_case([("k", "m")], "KkK") == "mmm"
        assert replace_ignore_case([("ǳ", "z")], "ǳǲǱ") == "zzz"
        assert replace_ignore_case([("bèta", "α"), ("Α", "alpha")], "BÈTA") == "alpha"
        assert replace_ignore_case([("ßèta", "sseta")], "ßèta") == "sseta"
        assert replace_ignore_case([("ßèta", "sseta")], "ẞÈTA") == "sseta"

    def test_surrogate_pairs_case_insensitive(self):
        assert (
            replace_ignore_case(
                [("\U0001f574", "levitating man in business suit")], "the \U0001f574"
            )
            == "the levitating man in business suit"
        )


class TestRunWithLimit:
    def test_limit_allows_result(self):
        r = Replacer.build(CASE_SENSITIVE, [("a", "xxxx")])
        assert r.run_with_limit("aa", 8) == "xxxxxxxx"

    def test_limit_exceeded_returns_none(self):
        r = Replacer.build(CASE_SENSITIVE, [("a", "xxxx")])
        assert r.run_with_limit("aa", 7) is None


HAYSTACK_CHARS = st.one_of(
    st.sampled_from("abAB"),
    st.just("İ"),
    st.characters(codec="utf-8"),
)
genHaystack = st.builds("".join, st.lists(HAYSTACK_CHARS, max_size=10))
genNeedle = st.text(alphabet="abAB", min_size=1, max_size=3)
genReplacement = st.text(max_size=5)
genReplaces = st.lists(st.tuples(genNeedle, genReplacement), max_size=4)


class TestProperties:
    @given(genHaystack, st.sampled_from([CASE_SENSITIVE, IGNORE_CASE]), genReplaces, genReplaces)
    @settings(max_examples=150, deadline=None)
    def test_compose(self, haystack, case, replaces1, replaces2):
        if case is IGNORE_CASE:
            replaces1 = [(utf8.lower_str(n), r) for n, r in replaces1]
            replaces2 = [(utf8.lower_str(n), r) for n, r in replaces2]
        rm1 = Replacer.build(case, replaces1)
        rm2 = Replacer.build(case, replaces2)
        rm12 = rm1.compose(rm2)
        assert rm12 is not None
        assert rm2.run(rm1.run(haystack)) == rm12.run(haystack)

    @given(st.sampled_from([CASE_SENSITIVE, IGNORE_CASE]), genHaystack)
    @settings(max_examples=100, deadline=None)
    def test_identity_for_empty_needles(self, case, haystack):
        assert Replacer.build(case, []).run(haystack) == haystack

    @given(genHaystack, genReplaces)
    @settings(max_examples=300, deadline=None)
    def test_equivalent_to_sequential_str_replace(self, haystack, replaces):
        expected = haystack
        for needle, replacement in replaces:
            expected = expected.replace(needle, replacement)
        assert replace(replaces, haystack) == expected

    def test_compose_case_mismatch(self):
        rm1 = Replacer.build(CASE_SENSITIVE, [("a", "b")])
        rm2 = Replacer.build(IGNORE_CASE, [("c", "d")])
        assert rm1.compose(rm2) is None


class TestStructure:
    def test_map_replacement(self):
        r = Replacer.build(CASE_SENSITIVE, [("a", "x")]).map_replacement(lambda b: b * 2)
        assert r.run("aaa") == "xxxxxx"

    def test_set_case_sensitivity(self):
        r = Replacer.build(CASE_SENSITIVE, [("a", "x")])
        assert r.run("AaA") == "AxA"
        assert r.set_case_sensitivity(IGNORE_CASE).run("AaA") == "xxx"

    def test_bytes_in_bytes_out(self):
        r = Replacer.build(CASE_SENSITIVE, [(b"a", b"x")])
        assert r.run(b"aba") == b"xbx"

    def test_json_roundtrip(self):
        # Reference derives FromJSON/ToJSON on the Replacer record
        # (Replacer.hs:72,83); round-trip must preserve behaviour and
        # equality for both case modes.
        for case in (CASE_SENSITIVE, IGNORE_CASE):
            r = Replacer.build(case, [("Tshirt", "X"), ("İstanbul", "Y")])
            rt = Replacer.from_json(r.to_json())
            assert rt == r
            hay = "my Tshirt from İSTANBUL tshirt"
            assert rt.run(hay) == r.run(hay)


class TestNpzRoundTrip:
    def test_replacer_payload_round_trip(self, tmp_path):
        """Payload values survive the packed artifact (versioned typed-JSON
        codec), and the reloaded Replacer runs bit-exactly."""
        from alfred_margaret_tpu.replacer import Replacer
        from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE

        pairs = [("tshirt", "TEE"), ("shirts", ""), ("ee", "f")]
        r = Replacer.build(CASE_SENSITIVE, pairs, engine="python")
        p = str(tmp_path / "r.npz")
        r.save_npz(p)
        r2 = Replacer.load_npz(p, engine="python")
        hay = "tshirts, shirts and tees everywhere"
        assert r2.run(hay) == r.run(hay)
        assert r2.searcher.needles == r.searcher.needles

        rci = Replacer.build(IGNORE_CASE, [("İstanbul", "IST"), ("ß", "ss")], engine="python")
        pci = str(tmp_path / "rci.npz")
        rci.save_npz(pci)
        rci2 = Replacer.load_npz(pci, engine="python")
        hay2 = "İSTANBUL straße"
        assert rci2.run(hay2) == rci.run(hay2)
        assert rci2.case_sensitivity is IGNORE_CASE

    def test_searcher_value_types_round_trip(self, tmp_path):
        from alfred_margaret_tpu.searcher import Searcher
        from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

        vals = [(b"ab", (1, "x")), (b"bc", {"k": [1, 2, b"\xff"]}), (b"cd", None)]
        s = Searcher.build_with_values(CASE_SENSITIVE, vals, engine="python")
        p = str(tmp_path / "s.npz")
        s.save_npz(p)
        s2 = Searcher.load_npz(p, engine="python")
        assert s2.needles == s.needles
        got = [(m.pos, m.value) for m in s2.all_matches(b"zabcdz")]
        want = [(m.pos, m.value) for m in s.all_matches(b"zabcdz")]
        assert got == want


def test_run_on_staged_haystack():
    """Replacer.run accepts a StagedHaystack from searcher.stage: the first
    pass's scan reuses the staging; output is bit-exact bytes (round 5,
    the serving pattern — one resident corpus feeds search AND replace)."""
    from alfred_margaret_tpu.replacer import Replacer
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE

    pairs = [("tshirt", "TEE"), ("shirts", "SHIRT"), ("ee", "f")]
    r = Replacer.build(CASE_SENSITIVE, pairs)
    text = b"short tshirts and tshirt shirts " * 500
    base = r.run(text)
    staged = r.searcher.stage(text)
    assert r.run(staged) == base
    assert r.run_with_limit(staged, 10) is None

    rci = Replacer.build(IGNORE_CASE, [("istanbul", "CITY"), ("fix", "ok")])
    t2 = "İstanbul FİX fix istanbul ".encode() * 300
    assert rci.run(rci.searcher.stage(t2)) == rci.run(t2)


def test_run_on_lowered_staged_haystack_rejected(monkeypatch):
    """A non-composed IgnoreCase staging keeps only the lowered bytes —
    Replacer.run must refuse it loudly instead of splicing lowered text."""
    import pytest

    from alfred_margaret_tpu.replacer import Replacer
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    from alfred_margaret_tpu.utils import config

    import dataclasses

    # Force the lowered-stream path (config.DEFAULT snapshots the env at
    # import and is frozen, so swap the module-level instance).
    monkeypatch.setattr(
        config, "DEFAULT",
        dataclasses.replace(config.DEFAULT, composed_ci_max_states=0),
    )
    r = Replacer.build(IGNORE_CASE, [("istanbul", "CITY")])
    staged = r.searcher.stage("İstanbul visit")
    assert staged.lowered is not None and not staged.composed
    with pytest.raises(ValueError, match="lowered bytes"):
        r.run(staged)
    # the raw haystack still works
    assert r.run("İstanbul visit") == "CITY visit"
