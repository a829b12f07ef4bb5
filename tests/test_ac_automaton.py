"""AC automaton construction + scalar oracle tests.

Ports the runText/runLower goldens of the reference's AhoCorasickSpec
(`tests/Data/Text/AhoCorasickSpec.hs:49-69`) and the README match examples,
plus property tests against a naive Python oracle using the reference's
fragment-pool generator strategy (`tests/Data/Text/TestInstances.hs:36-56`).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.utils import utf8
from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE


def count_matches(case, needles, haystack):
    if not needles:
        return 0
    machine = ac.build([(n, ()) for n in needles])
    return ac.count_matches(machine, haystack, case)


def naive_count_overlapping(needles, haystack: str) -> int:
    """Oracle: all (overlapping) occurrences of each needle."""
    hay = haystack.encode()
    total = 0
    for n in needles:
        nb = n.encode()
        if not nb:
            continue
        start = 0
        while True:
            i = hay.find(nb, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


# The reference's generator strategy: needles and haystack share a fragment
# pool so matches, partial matches and shared prefixes/suffixes are frequent.
ALPHABETS = [
    "abAB12",
    "aAБВ\U0001d11e\U0001f4a9ßẞÅÅå",  # "fancy" alphabet with unicode traps
]


@st.composite
def needle_haystack(draw, case_invariant=False):
    alphabet = draw(st.sampled_from(ALPHABETS))
    fragments = draw(
        st.lists(st.text(alphabet=alphabet, min_size=1, max_size=3), min_size=1, max_size=5)
    )
    frag = st.sampled_from(fragments)
    needles = draw(st.lists(st.builds("".join, st.lists(frag, min_size=1, max_size=2)), min_size=0, max_size=5))
    haystack = draw(st.builds("".join, st.lists(frag, min_size=0, max_size=30)))
    return needles, haystack


class TestCountGoldens:
    def test_basic(self):
        assert count_matches(CASE_SENSITIVE, ["abc", "rst", "xyz"], "abcdefghijklmnopqrstuvwxyz") == 3

    def test_mixed_code_unit_widths(self):
        assert count_matches(CASE_SENSITIVE, ["$", "£"], "$€£\U00010348") == 2

    def test_ignore_case_basic(self):
        assert count_matches(IGNORE_CASE, ["abc", "rst", "xyz"], "abcdefghijklmnopqrstuvwxyz") == 3

    def test_ignore_case_uppercase_needles_dont_match(self):
        assert count_matches(IGNORE_CASE, ["ABC", "Rst", "xYZ"], "abcdefghijklmnopqrstuvwxyz") == 0

    def test_ignore_case_non_ascii(self):
        needles = ["groß", "öffnung", "tür"]
        assert count_matches(IGNORE_CASE, needles, "Großfräsmaschinenöffnungstür") == 3
        assert count_matches(IGNORE_CASE, needles, "GROẞFRÄSMASCHINENÖFFNUNGSTÜR") == 3


class TestMatchPositions:
    def test_readme_all_matches(self):
        machine = ac.build([(n, n) for n in ["tshirt", "shirts", "shorts"]])
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "short tshirts")]
        assert got == [(12, "tshirt"), (13, "shirts")]
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "sweatshirts and shirtshirts")]
        assert got == [
            (10, "tshirt"), (11, "shirts"), (22, "shirts"), (26, "tshirt"), (27, "shirts"),
        ]

    def test_overlapping_same_end(self):
        machine = ac.build([("aa", 0), ("aaa", 1)])
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "aaaa")]
        # Same-end matches: longest (own value) first, then fallback chain.
        assert got == [(2, 0), (3, 1), (3, 0), (4, 1), (4, 0)]

    def test_duplicate_needles_merge_latest_first(self):
        machine = ac.build([("ab", "first"), ("ab", "second")])
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "xab")]
        assert got == [(3, "second"), (3, "first")]

    def test_early_exit(self):
        machine = ac.build([("aa", 0), ("aaa", 1)])
        assert ac.run_text(None, lambda acc, m: ac.Done(m.pos), machine, "bbaab") == 4

    def test_ignore_case_positions_are_raw(self):
        # İ is 2 raw bytes but lowers to 1-byte i: raw positions must be used.
        machine = ac.build([("i", ())])
        got = [m.pos for m in ac.all_matches(machine, "İİx", IGNORE_CASE)]
        assert got == [2, 4]


class TestEmptyNeedleSemantics:
    def test_empty_needle_alone_never_matches(self):
        machine = ac.build([("", "E")])
        assert ac.all_matches(machine, "abc") == []
        assert ac.all_matches(machine, "") == []

    def test_empty_needle_piggybacks_on_other_transitions(self):
        # Reference quirk: the empty needle's value leaks into every state's
        # flattened output set (buildValueMap), so it is reported whenever a
        # real transition fires.
        machine = ac.build([("", "E"), ("a", "A")])
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "a")]
        assert got == [(1, "A"), (1, "E")]

    def test_empty_needle_not_emitted_mid_code_point(self):
        # é is 2 bytes; the empty-needle value must fire once per code point
        # transition, not once per byte.
        machine = ac.build([("", "E"), ("é", "X")])
        got = [(m.pos, m.value) for m in ac.all_matches(machine, "é")]
        assert got == [(2, "X"), (2, "E")]


class TestProperties:
    @given(needle_haystack())
    @settings(max_examples=300, deadline=None)
    def test_count_equals_naive_oracle(self, nh):
        needles, haystack = nh
        assert count_matches(CASE_SENSITIVE, needles, haystack) == naive_count_overlapping(
            needles, haystack
        )

    @given(needle_haystack())
    @settings(max_examples=200, deadline=None)
    def test_ignore_case_equals_lowered_oracle(self, nh):
        needles, haystack = nh
        lowered_needles = [utf8.lower_str(n) for n in needles]
        got = count_matches(IGNORE_CASE, lowered_needles, haystack)
        expected = naive_count_overlapping(lowered_needles, utf8.lower_str(haystack))
        assert got == expected

    @given(needle_haystack())
    @settings(max_examples=100, deadline=None)
    def test_match_positions_end_of_needle(self, nh):
        """Every reported (pos, needle) must satisfy haystack[pos-len:pos] == needle."""
        needles, haystack = nh
        needles = [n for n in needles if n]
        machine = ac.build([(n, n.encode()) for n in needles])
        hay = haystack.encode()
        for m in ac.all_matches(machine, haystack):
            assert hay[m.pos - len(m.value) : m.pos] == m.value


class TestNeedleCasings:
    def test_docstring_examples(self):
        assert ac.needle_casings("abc") == [
            "abc", "abC", "aBc", "aBC", "Abc", "AbC", "ABc", "ABC",
        ]
        assert ac.needle_casings("ABC") == []
        assert [[ord(c) for c in s] for s in ac.needle_casings("ω1")] == [
            [0x2126, 0x31], [0x3C9, 0x31], [0x3A9, 0x31],
        ]


class TestDotDump:
    def test_shape(self):
        dot = ac.debug_build_dot(["ab", "bc"])
        assert dot.startswith("digraph {")
        assert "doublecircle" in dot
        assert "style = dashed" in dot


class TestPersistence:
    def test_npz_roundtrip(self, tmp_path):
        from alfred_margaret_tpu.models.ac import build, load_npz, save_npz, validate_machine

        m = build([("tshirt", 0), ("shirts", 1), ("İst", 2)])
        validate_machine(m)
        path = str(tmp_path / "machine.npz")
        save_npz(m, path)
        m2 = load_npz(path)
        validate_machine(m2)
        assert (m2.delta == m.delta).all()
        assert m2.needles == m.needles
        assert m2.values == m.values
        hay = "short tshirts İst"
        from alfred_margaret_tpu.models import ac as ac_mod

        assert [
            (mt.pos, mt.value) for mt in ac_mod.all_matches(m2, hay)
        ] == [(mt.pos, mt.value) for mt in ac_mod.all_matches(m, hay)]

    def test_validate_catches_corruption(self):
        import numpy as np
        import pytest as _pytest

        from alfred_margaret_tpu.models.ac import build, validate_machine

        m = build([("ab", 0)])
        bad = m.delta.copy()
        bad[0, 0] = 10_000
        import dataclasses

        m_bad = dataclasses.replace(m, delta=bad)
        with _pytest.raises(AssertionError):
            validate_machine(m_bad)


class TestByteGranularNeedles:
    """Needles that are not whole UTF-8 sequences must still match
    byte-granularly (regression: their outputs were silently dropped as
    'mid-code-point' states)."""

    def test_latin1_needle_matches(self):
        m = ac.build([(b"caf\xe9", 0)])
        assert ac.count_matches(m, b"xx caf\xe9 caf\xe9") == 2

    def test_lone_invalid_bytes(self):
        m = ac.build([(b"\xff", 0), (b"ab", 1)])
        assert ac.count_matches(m, b"a\xffab") == 2

    def test_trail_byte_needle_and_suffix_inheritance(self):
        # b"\xa9" is a suffix of b"\xc3\xa9"; both must fire at the same end.
        m = ac.build([(b"\xa9", 0), (b"\xc3\xa9", 1)])
        got = [(mm.pos, mm.value) for mm in ac.all_matches(m, b"x\xc3\xa9")]
        assert got == [(3, 1), (3, 0)]
        assert ac.count_matches(m, b"z\xa9") == 1
