"""Count-preserving DFA minimization (models/minimize.py).

The quotient machine must produce bit-identical per-position match counts
on every input while (typically) shrinking 10-20% — the gather-count
currency of the Pallas kernels.  Mirrors the reference's conformance
stance: behavior proven against the unminimized machine, which is itself
oracle-tested (SURVEY.md §4).
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.models.minimize import (
    count_minimized,
    minimize_for_counts,
    minimize_sticky,
)
from alfred_margaret_tpu.ops.pallas_scan import _StickyView


def _scan_counts(machine, data: np.ndarray) -> np.ndarray:
    """Per-position match counts via the dense delta (vectorized oracle)."""
    out = np.empty(len(data), dtype=np.int64)
    s = 0
    for i, b in enumerate(data):
        s = int(machine.delta[s, b])
        out[i] = machine.match_count[s]
    return out


def _random_needles(rng, n, lo=3, hi=9):
    out = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(lo, hi)))
            for _ in range(n + 20)
        )
    )[:n]
    return out


def _mixed_corpus(rng, needles, n_frags=300):
    frags = [n.encode() for n in needles[: max(4, len(needles) // 3)]]
    frags += [bytes(rng.integers(97, 123, size=7, dtype=np.uint8)) for _ in range(8)]
    pick = rng.integers(0, len(frags), size=n_frags)
    return np.frombuffer(b"".join(frags[i] for i in pick), dtype=np.uint8)


def test_per_position_count_parity_fuzz():
    for seed in range(6):
        rng = np.random.default_rng(seed)
        needles = _random_needles(rng, 40 + seed * 30)
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        mm = minimize_for_counts(m)
        assert mm.n_states <= m.n_states
        data = _mixed_corpus(rng, needles)
        np.testing.assert_array_equal(_scan_counts(m, data), _scan_counts(mm, data))


def test_shrinks_and_is_idempotent():
    rng = np.random.default_rng(7)
    needles = _random_needles(rng, 100)
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    mm = minimize_for_counts(m)
    assert mm.n_states < m.n_states  # terminal leaves of distinct needles merge
    m2 = minimize_for_counts(mm)
    assert m2.n_states == mm.n_states
    # Invariants preserved for the engine layers.
    assert mm.max_needle_bytes == m.max_needle_bytes
    assert mm.composed_ci == m.composed_ci
    assert int(mm.match_count.max()) == int(m.match_count.max())


def test_overlapping_needles_high_counts():
    # "a", "aa", ..., plus needles sharing suffixes: exercises count>1 states.
    needles = ["a", "aa", "aaa", "ba", "cba", "aba", "b"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    mm = minimize_for_counts(m)
    rng = np.random.default_rng(1)
    data = np.frombuffer(
        b"".join(rng.choice([b"a", b"b", b"c"]) for _ in range(4000)), dtype=np.uint8
    )
    np.testing.assert_array_equal(_scan_counts(m, data), _scan_counts(mm, data))


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("AMT_MINIMIZE", "0")
    rng = np.random.default_rng(3)
    needles = _random_needles(rng, 50)
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    assert count_minimized(m) is m


def test_protect_blocks_merging():
    needles = ["ab", "cd"]  # the two terminal states are count-equivalent
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    plain = minimize_for_counts(m)
    tags = np.zeros(m.n_states, dtype=np.int64)
    # Tag the state reached by "ab" so it cannot merge with "cd"'s state.
    s = 0
    for b in b"ab":
        s = int(m.delta[s, b])
    tags[s] = 1
    prot = minimize_for_counts(m, protect=tags)
    assert prot.n_states == plain.n_states + 1


def test_sticky_minimize_preserves_contains():
    rng = np.random.default_rng(5)
    needles = _random_needles(rng, 60)
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    sv = _StickyView(m)
    svm = minimize_sticky(sv)
    assert svm.delta.shape[0] < sv.delta.shape[0]
    # absorb is genuinely absorbing and unique
    assert (svm.delta[svm.absorb] == svm.absorb).all()
    # containment parity on hit-rich and hit-free corpora
    for data in (
        _mixed_corpus(rng, needles),
        np.frombuffer(b"zzzz" * 500, dtype=np.uint8),
    ):
        s_full = 0
        for b in data:
            s_full = int(sv.delta[s_full, b])
        s_min = 0
        for b in data:
            s_min = int(svm.delta[s_min, b])
        assert (s_full == sv.absorb) == (s_min == svm.absorb)


def test_composed_ci_machine_parity():
    from alfred_margaret_tpu.models import case_dfa

    needles = [b"stra\xc3\x9fe", b"k\xc3\xb6ln", b"abc"]  # straße, köln
    if not case_dfa.eligible(needles):
        pytest.skip("composed CI not eligible for this needle set")
    m = case_dfa.compose_build([(n, i) for i, n in enumerate(needles)])
    mm = minimize_for_counts(m)
    data = np.frombuffer("im STRASSE kÖlN straße abc".encode(), dtype=np.uint8)
    np.testing.assert_array_equal(_scan_counts(m, data), _scan_counts(mm, data))
    assert mm.composed_ci == m.composed_ci


def test_engine_count_uses_minimized_tables(monkeypatch):
    """The comb16 engine's count tables come from the quotient machine while
    matches_arrays still reports true value ids."""
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine

    rng = np.random.default_rng(11)
    needles = _random_needles(rng, 80)
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = Comb16PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True)
    assert eng.c16.n_states < m.n_states  # count set is the quotient
    data = _mixed_corpus(rng, needles, n_frags=60)
    expected = int(_scan_counts(m, data).sum())
    assert eng.count(data) == expected
    ends, vals = eng.matches_arrays(bytes(data))
    assert len(ends) == expected
    # spot-check value ids against the scalar oracle's emission
    got = list(zip(ends.tolist(), vals.tolist()))
    ref = []
    s = 0
    for i, b in enumerate(data):
        s = int(m.delta[s, b])
        for v in m.outputs(s):
            ref.append((i + 1, int(v)))
    assert got == ref
