"""Incremental Replacer engine vs the full-rescan loop.

The incremental engine (one full scan + per-pass window patching,
``replacer._run_incremental``) must produce byte-identical output to the
full-rescan multi-pass loop for every input — including replacements that
create new matches of lower priorities, overlapping matches, empty
replacements, and composed-CI scans with byte-length-changing case pairs.
"""

import random

import pytest

from alfred_margaret_tpu import CASE_SENSITIVE, IGNORE_CASE, Replacer
from alfred_margaret_tpu import replacer as replacer_mod
from alfred_margaret_tpu.engine import MatchEngine
from alfred_margaret_tpu.utils import utf8


def both_ways(case, replaces, haystack, monkeypatch, engine="python"):
    monkeypatch.setattr(replacer_mod, "INCREMENTAL", True)
    inc = Replacer.build(case, replaces, engine=engine).run(haystack)
    monkeypatch.setattr(replacer_mod, "INCREMENTAL", False)
    full = Replacer.build(case, replaces, engine=engine).run(haystack)
    assert inc == full, (replaces, haystack[:80], inc[:120], full[:120])
    return inc


class TestEquivalence:
    def test_cascading_lower_priority_matches(self, monkeypatch):
        # Replacement of priority 0 creates matches for priorities below.
        out = both_ways(
            CASE_SENSITIVE,
            [("foo", "barbar"), ("bar", "baz"), ("zb", "Q")],
            "foo x foo bar",
            monkeypatch,
        )
        assert "foo" not in out

    def test_empty_replacement_joins_new_matches(self, monkeypatch):
        # Deleting 'xx' joins 'a'+'b' into a new lower-priority match 'ab'.
        both_ways(
            CASE_SENSITIVE,
            [("xx", ""), ("ab", "<AB>")],
            "a" + "xx" + "b  axxb  ab xxab",
            monkeypatch,
        )

    def test_overlap_and_priority_order(self, monkeypatch):
        both_ways(
            CASE_SENSITIVE,
            [("aa", "zz"), ("bb", "w"), ("zzw", "!")],
            "aaabbb aab abab aaaa",
            monkeypatch,
        )

    def test_fuzz_case_sensitive(self, monkeypatch):
        rng = random.Random(99)
        for _ in range(40):
            alpha = "ab"
            needles = list({
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 3)))
                for _ in range(rng.randint(1, 4))
            })
            repls = [
                (n, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 3))))
                for n in needles
            ]
            hay = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 120)))
            both_ways(CASE_SENSITIVE, repls, hay, monkeypatch)

    def test_fuzz_ignore_case_composed(self, monkeypatch):
        monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)
        rng = random.Random(7)
        alpha = "aAßẞkKİi"
        for _ in range(25):
            needles = list({
                utf8.lower_str("".join(rng.choice(alpha) for _ in range(rng.randint(1, 3))))
                for _ in range(rng.randint(1, 3))
            })
            repls = [
                (n, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 2))))
                for n in needles
            ]
            hay = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
            both_ways(IGNORE_CASE, repls, hay, monkeypatch)

    def test_ignore_case_kelvin_byte_shrink(self, monkeypatch):
        monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)
        # K (3 bytes) matches needle 'k' (1 byte): spans differ from needle
        # byte length; windows must use raw spans.
        both_ways(
            IGNORE_CASE,
            [("ka", "X"), ("xk", "<>")],
            "Ka ka KA xK xk İk Ka",
            monkeypatch,
        )

    def test_run_with_limit_budget(self, monkeypatch):
        for flag in (True, False):
            monkeypatch.setattr(replacer_mod, "INCREMENTAL", flag)
            r = Replacer.build(CASE_SENSITIVE, [("a", "bbbb")])
            assert r.run_with_limit("aaaa", 6) is None
            assert r.run_with_limit("aaaa", 16) == "bbbbbbbbbbbbbbbb"

    def test_large_input_windows_path(self, monkeypatch):
        # Big enough that the window path (not the full-rescan gate) runs.
        rng = random.Random(3)
        filler = "".join(rng.choice("qwrtypsdfghjkl ") for _ in range(200_000))
        hay = filler[:50_000] + " tshirt " + filler[50_000:100_000] + " shirts shorts " + filler[100_000:]
        out = both_ways(
            CASE_SENSITIVE,
            [("tshirt", "TEE"), ("shirts", "S"), ("ee", "f"), ("short", "sh")],
            hay,
            monkeypatch,
        )
        assert "tshirt" not in out


class TestBatchedFastPath:
    """The batched single-splice path (``_run_batched``): engages only when
    no replacement can create a match; must be bit-exact with both the
    window-rescan incremental loop and the full-rescan loop."""

    def test_eligibility(self):
        import numpy as np

        r = Replacer.build(CASE_SENSITIVE, [("abc", "XY"), ("bd", "Z")])
        assert r._no_creation_eligible(np.array([0, 1]))
        # Replacement shares byte 'a' with the needles: can create.
        r2 = Replacer.build(CASE_SENSITIVE, [("abc", "Xa"), ("bd", "Z")])
        assert not r2._no_creation_eligible(np.array([0, 1]))
        # Empty replacement can create matches by joining neighbors.
        r3 = Replacer.build(CASE_SENSITIVE, [("abc", ""), ("bd", "Z")])
        assert not r3._no_creation_eligible(np.array([0, 1]))
        # IgnoreCase: universe includes case-variant bytes ('X' is a
        # variant of needle byte 'x').
        r4 = Replacer.build(IGNORE_CASE, [("xy", "X")])
        assert not r4._no_creation_eligible(np.array([0]))
        r5 = Replacer.build(IGNORE_CASE, [("xy", "Q9")])
        assert r5._no_creation_eligible(np.array([0]))

    def test_batched_matches_sequential(self, monkeypatch):
        # All replacements disjoint from needle bytes: batched path fires
        # and must equal the full-rescan loop (priority + leftmost rules).
        out = both_ways(
            CASE_SENSITIVE,
            [("aba", "X"), ("ab", "YY"), ("b", "Z")],
            "abababa b ab aba",
            monkeypatch,
        )
        assert out == "XZX Z YY X".replace("Z", "Z")  # same string both ways

    def test_batched_max_length(self, monkeypatch):
        monkeypatch.setattr(replacer_mod, "INCREMENTAL", True)
        r = Replacer.build(CASE_SENSITIVE, [("a", "QQQQ")])
        assert r.run_with_limit("aaaa", 6) is None
        assert r.run_with_limit("aaaa", 16) == "QQQQQQQQQQQQQQQQ"

    def test_batched_priority_destruction(self, monkeypatch):
        # Higher priority consumes the span a lower-priority match needed.
        out = both_ways(
            CASE_SENSITIVE,
            [("abc", "X"), ("cd", "Y")],
            "abcd cd abc",
            monkeypatch,
        )
        assert out == "Xd Y X"


class TestEmptyNeedle:
    """Empty-needle replacers: the root-piggyback quirk flows through the
    match list — X lands after every code point whose resulting state is
    non-root; alone, the empty needle never fires (root collects nothing).
    All three loops (incremental incl. batched, full-rescan, scalar python
    engine) must agree byte-for-byte."""

    @pytest.mark.parametrize(
        "needles,text,want",
        [
            ([("", "X")], "abcab", "abcab"),
            ([("", "X"), ("ab", "Y")], "abcab", "aXbXcaXbX"),
            ([("ab", "Y"), ("", "-")], "abcab", "YcY"),
            ([("", "X"), ("ab", "Y")], "aßb", "aXßb"),
        ],
    )
    def test_three_way_agreement(self, needles, text, want, monkeypatch):
        out = both_ways(CASE_SENSITIVE, needles, text, monkeypatch)
        assert out == want
        got_py = Replacer.build(CASE_SENSITIVE, needles, engine="python").run(text)
        assert got_py == want
