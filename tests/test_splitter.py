"""Splitter tests, porting the reference's AhoCorasickSpec Splitter section
(`tests/Data/Text/AhoCorasickSpec.hs:220-244`)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu import Splitter


class TestSplit:
    def test_overlapping_separators_example(self):
        splitter = Splitter.build("bob")
        assert splitter.split("C++bobobCOBOLbobScala") == ["C++", "obCOBOL", "Scala"]
        assert splitter.split_ignore_case("C++bobobCOBOLbobScala") == ["C++", "obCOBOL", "Scala"]
        assert splitter.split_ignore_case("C++BOBOBCOBOLBOBSCALA") == ["C++", "OBCOBOL", "SCALA"]

    def test_iliad(self):
        splitter = Splitter.build(", ")
        line = "Ἄνδρα μοι ἔννεπε, Μοῦσα, πολύτροπον, ὃς μάλα πολλὰ"
        expected = ["Ἄνδρα μοι ἔννεπε", "Μοῦσα", "πολύτροπον", "ὃς μάλα πολλὰ"]
        assert splitter.split(line) == expected
        assert splitter.split_ignore_case(line) == expected

    def test_case_insensitive_variable_byte_lengths(self):
        # The case variations of å have different byte lengths (Å is 3 bytes).
        splitter = Splitter.build("å")
        assert splitter.split_ignore_case("aaåbbÅccÅdd") == ["aa", "bb", "cc", "dd"]

    def test_no_separator_yields_whole(self):
        assert Splitter.build("x").split("hello") == ["hello"]
        assert Splitter.build("x").split("") == [""]

    def test_reverse_variants(self):
        splitter = Splitter.build("-")
        assert splitter.split_reverse("a-b-c") == ["c", "b", "a"]
        assert splitter.split_reverse_ignore_case("a-b-c") == ["c", "b", "a"]

    @given(st.text(alphabet="ab-", max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_equivalent_to_str_split_single_char(self, haystack):
        # For a 1-char separator with no self-overlap, split == str.split.
        assert Splitter.build("-").split(haystack) == haystack.split("-")

    @given(st.text(alphabet="ab", min_size=1, max_size=3), st.text(alphabet="ab", max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_join_roundtrip(self, sep, haystack):
        """Fragments joined by matched separators must reproduce the haystack
        byte-for-byte; N separators -> N+1 fragments."""
        parts = Splitter.build(sep).split(haystack)
        assert sep.join(parts) == haystack or sep not in haystack
        # non-overlap property: python's split has identical non-overlapping
        # leftmost semantics for case-sensitive matching
        assert parts == haystack.split(sep)

    def test_structure(self):
        a = Splitter.build("x")
        assert a == Splitter.build("x") and hash(a) == hash(Splitter.build("x"))
        assert a != Splitter.build("y")
        assert a.separator == b"x"
        assert Splitter.from_json(a.to_json()) == a
        assert a.automaton.n_states == 2


def test_bytes_separator_non_utf8():
    """Non-UTF-8 byte separators construct and split case-sensitively
    (the str form is only needed for IGNORE_CASE / to_json)."""
    from alfred_margaret_tpu import Splitter

    sp = Splitter.build(b"\xff")
    assert sp.split(b"a\xffb\xffc") == [b"a", b"b", b"c"]
