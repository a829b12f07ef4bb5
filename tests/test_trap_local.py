"""Localized CI trap-fire recovery (round 5, VERDICT item 4).

A length-changing unlowering (İ/K/Å/ẞ/…) in the corpus used to force a
FULL composed-dense re-scan (one-shot staged) or a full per-shard dense
re-scan (mesh).  The kernels already emit a per-stream trap plane, so
recovery now re-derives ONLY the trapped streams' counts from the raw
corpus bytes on the host (a few KiB per stream: count(window) minus
count(warm prefix)).  These tests pin BOTH the exactness and the
engagement of the partial path (the dense fallback program must NOT get
built when a lone trap fires).
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac, case_dfa
from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine, plan_bitap_ci
from alfred_margaret_tpu.utils import utf8
from alfred_margaret_tpu.utils.case import IGNORE_CASE


def _composed(needles):
    low = [utf8.lower_str(n) for n in needles]
    m = ac.build([(n, i) for i, n in enumerate(low)])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    return m, cm


def _eng(cm, lay, **kw):
    kw.setdefault("n_streams", 256)
    kw.setdefault("t_tile", 32)
    kw.setdefault("interpret", True)
    return BitapAcEngine(cm, layout=lay, **kw)


def _one_kelvin_corpus(n_bytes: int) -> bytes:
    """Mostly-clean corpus with ONE Kelvin-sign match site in the middle
    (the track misses it, the trap plane flags exactly its stream)."""
    unit = b"kilo dress filler pad "
    data = bytearray(unit * (n_bytes // len(unit) + 1))[:n_bytes]
    mid = n_bytes // 2
    patch = "Ångstrom KILO zz".encode()  # Å-sign noise + Kelvin KILO
    data[mid : mid + len(patch)] = patch
    return bytes(data)


def test_localized_count_single_chip():
    m, cm = _composed(["kilo", "dress"])
    lay = plan_bitap_ci(cm)
    assert lay is not None and lay.has_trap
    eng = _eng(cm, lay)
    data = _one_kelvin_corpus(64 << 10)
    exp = ac.count_matches(m, data, IGNORE_CASE)
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    assert eng.count_staged(st) == exp
    # The lone trapped stream took the HOST path: the dense count program
    # must not exist (super().count_staged would have compiled it).
    assert (st.plan.time_len, 1) not in eng._count_fn
    # reps scale the localized recovery too (sustained-throughput mode).
    assert eng.count_staged(st, reps=3) == 3 * exp


def test_localized_contains_single_chip():
    m, cm = _composed(["kilo"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    # No clean 'kilo' anywhere: only the Kelvin site can match, and only
    # the trapped stream's host re-scan can find it.
    unit = b"dress filler pad xyzw "
    data = bytearray(unit * ((64 << 10) // len(unit) + 1))[: 64 << 10]
    mid = len(data) // 2
    patch = "KILO".encode()
    data[mid : mid + len(patch)] = patch
    data = bytes(data)
    exp = ac.count_matches(m, data, IGNORE_CASE)
    assert exp == 1
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    assert eng.contains_staged(st) is True
    # the sticky dense fallback was never touched
    assert eng._contains_state is None or not eng._contains_state["fns"]

    clean = bytes(unit * ((64 << 10) // len(unit)))
    st2 = eng.stage(np.frombuffer(clean, dtype=np.uint8))
    assert eng.contains_staged(st2) is False


def test_dense_fallback_when_traps_everywhere():
    """Saturated trap corpora still take the one-shot dense re-scan (the
    localization budget: > max(32, 1%) trapped streams)."""
    m, cm = _composed(["kilo", "dress"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    data = ("KILO dress " * 3000).encode()  # Kelvin in every stream
    exp = ac.count_matches(m, data, IGNORE_CASE)
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    assert eng.count_staged(st) == exp
    assert (st.plan.time_len, 1) in eng._count_fn  # dense path engaged


def test_localized_count_mesh():
    import jax

    from alfred_margaret_tpu.parallel.shard import DistributedAcEngine, make_mesh

    m, cm = _composed(["kilo", "dress"])
    mesh = make_mesh(jax.devices()[:4], data=4, seq=1)
    engine = DistributedAcEngine(cm, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is not None and engine._bitap_lay.has_trap
    data = _one_kelvin_corpus(128 << 10)
    exp = ac.count_matches(m, data, IGNORE_CASE)
    assert engine.count(data) == exp
    # localized: the dense per-shard fallback was never built
    assert not any(
        isinstance(k, tuple) and k and isinstance(k[0], str) and k[0].startswith("dense")
        for k in (engine._count_step or {})
    )
    assert engine.contains_any(data) is True
    assert not any(
        isinstance(k, tuple) and k and isinstance(k[0], str) and k[0].startswith("dense")
        for k in (engine._count_step or {})
    )


def test_localized_streaming_chunks():
    """Streaming over a trap-bearing CI bitap engine: the chunk containing
    the Kelvin recovers locally; other chunks never leave the fast path."""
    from alfred_margaret_tpu.ops.streaming import StreamingScanner

    m, cm = _composed(["kilo", "dress"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    data = _one_kelvin_corpus(96 << 10)
    exp = ac.count_matches(m, data, IGNORE_CASE)
    sc = StreamingScanner(eng, cm, chunk_bytes=32 << 10)
    assert sc.count(data) == exp
    assert sc.contains(data) is True
