"""comb16 (16-bit three-tier comb) engine: build invariants + scan parity.

The build already self-verifies every (state, class) resolution
exhaustively; these tests cover the kernel paths (interpret mode) against
the scalar oracle, plus the capacity/fallback gates.
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops.comb16_scan import (
    Comb16PallasAcEngine,
    build_comb16,
    comb16_structure_cost,
)
from alfred_margaret_tpu.ops.comb_scan import plan_pallas
from alfred_margaret_tpu.ops.pallas_scan import CapacityError


def _needles100():
    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(110)
        )
    )[:100]
    needles[:4] = ["abc", "abcd", "bcd", "c"]  # nested => per-state count 2
    return needles


@pytest.fixture(scope="module")
def m100():
    needles = _needles100()
    return ac.build([(n, i) for i, n in enumerate(needles)]), needles


@pytest.fixture(scope="module")
def eng100(m100):
    return Comb16PallasAcEngine(m100[0], n_streams=1024, t_tile=64, interpret=True)


def test_build_fields_and_ranges(m100):
    c16 = build_comb16(m100[0])
    assert c16.CB == 1 and c16.OB in (4, 5)
    assert c16.CB + c16.OB + c16.BB == 16
    # Nested needles give a count-2 state: encoded via a base range.
    assert len(c16.count_ranges) == 1
    mc = np.asarray(m100[0].match_count)
    # Range encoding exact for every state.
    got = np.minimum(mc, 1) + c16.count_of_base(c16.base)
    assert (got == mc).all()
    # Bases unique and in range.
    assert len(np.unique(c16.base)) == c16.n_states
    assert c16.base.max() < c16.rows_c * 256


def test_owner_residue_soundness(m100):
    """No two bases within k share an owner residue (exactness of the
    truncated owner check)."""
    c16 = build_comb16(m100[0])
    b = np.sort(c16.base.astype(np.int64))
    for i in range(len(b)):
        j = i + 1
        while j < len(b) and b[j] - b[i] < c16.k:
            assert (b[i] & c16.owner_mask) != (b[j] & c16.owner_mask)
            j += 1


def test_count_parity(eng100, m100):
    m, needles = m100
    corpus = synth_corpus(needles, 1 << 18, hit_fraction=0.02, seed=5)
    assert eng100.count(corpus) == ac.count_matches(m, corpus)


def test_contains(eng100, m100):
    m, needles = m100
    corpus = synth_corpus(needles, 1 << 16, hit_fraction=0.01, seed=6)
    assert eng100.contains(corpus) is True
    assert eng100.contains(b"zzz qqq 0123") is False


def test_matches_emission_order(eng100, m100):
    m, needles = m100
    corpus = synth_corpus(needles, 1 << 17, hit_fraction=0.02, seed=8)
    ends, vids = eng100.matches_arrays(corpus)
    oracle = ac.all_matches(m, corpus)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value
        for e, v, o in zip(ends, vids, oracle)
    )


def test_final_states(eng100, m100):
    m, needles = m100
    corpus = synth_corpus(needles, 3000, hit_fraction=0.05, seed=9)
    got = eng100.final_states(corpus)
    # Scalar reference pass.
    state, want = 0, []
    for by in corpus:
        state = m.delta[state, by]
        want.append(state)
    assert (got == np.asarray(want)).all()


def test_planner_prefers_comb16_midtier(m100):
    kind, cost = plan_pallas(m100[0])
    assert kind == "comb16"
    assert cost <= 8


def test_capacity_gate():
    # Thousands of states exceed the comb16 base space.
    rng = np.random.default_rng(3)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=10))
            for _ in range(2500)
        )
    )[:2000]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    with pytest.raises(CapacityError):
        build_comb16(m)


def test_nul_needle_machine():
    # NUL-containing needles: zero byte is not inert; masking must hold.
    m = ac.build([(b"a\x00b", 0), (b"ab", 1)])
    eng = Comb16PallasAcEngine(m, n_streams=128, t_tile=32, interpret=True)
    corpus = b"xa\x00bqqab" + b"z" * 400
    assert eng.count(corpus) == ac.count_matches(m, corpus)


def test_empty_and_tiny_inputs(eng100):
    assert eng100.count(b"") == 0
    assert eng100.contains(b"") is False
    assert eng100.count(b"c") == 1  # single-byte needle "c"


def test_fuzz_random_needle_sets():
    """Randomized build+count parity across needle-set shapes (sizes that
    exercise both OB/BB splits and the count-range arenas)."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        n = int(rng.integers(5, 140))
        needles = list(
            dict.fromkeys(
                "".join(chr(97 + c) for c in rng.integers(0, 8, size=rng.integers(1, 7)))
                for _ in range(n)
            )
        )
        m = ac.build([(x, i) for i, x in enumerate(needles)])
        try:
            eng = Comb16PallasAcEngine(m, n_streams=256, t_tile=32, interpret=True)
        except CapacityError:
            continue  # small-alphabet sets can blow the base space; fine
        corpus = synth_corpus(needles, 40000, hit_fraction=0.05, seed=int(rng.integers(1 << 30)))
        assert eng.count(corpus) == ac.count_matches(m, corpus), needles


def test_prefilter_env_gate(monkeypatch):
    from alfred_margaret_tpu.engine import MatchEngine

    needles = ["abcde", "fghij", "klmno"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = MatchEngine(m, "cpp")
    monkeypatch.setenv("AMT_PREFILTER", "1")
    hay = b"zz abcde zz fghij" * 400
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    got = eng.count(hay, CASE_SENSITIVE)
    assert got == ac.count_matches(m, hay)
    assert eng._prefilter() is not None
    assert eng.contains_any(hay, CASE_SENSITIVE) is True


def test_high_count_range_encoding():
    """Nested suffix chains give per-state match counts up to 5: the
    base-range encoding (count = bit + range compares) must stay exact
    through MAX_COUNT16."""
    needles = ["a", "aa", "aaa", "aaaa", "aaaaa", "baaaaa", "c"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    # "baaaaa" ends baaaaa+aaaaa+aaaa+aaa+aa+a = 6 needles at one state.
    assert int(np.asarray(m.match_count).max()) == 6
    c16 = build_comb16(m)
    assert len(c16.count_ranges) == 5  # thresholds for counts 2..6
    mc = np.asarray(m.match_count)
    got = np.minimum(mc, 1) + c16.count_of_base(c16.base)
    assert (got == mc).all()
    eng = Comb16PallasAcEngine(m, n_streams=128, t_tile=32, interpret=True)
    hay = b"aaaaaa baaaaa ca aa" * 30
    assert eng.count(hay) == ac.count_matches(m, hay)
    ends, vids = eng.matches_arrays(hay)
    oracle = ac.all_matches(m, hay)
    assert len(ends) == len(oracle)
    assert all(int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle))
