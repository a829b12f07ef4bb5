"""Opt-in real-TPU lane: ``AMT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py``.

Runs the Pallas kernels NON-interpreted on a chip and cross-checks counts,
existence, and match extraction against the scalar oracle — the repeatable
target that replaces round 1's manual AMT_VALIDATE soak.  Skipped entirely
in the default CPU lane (CI and local runs without hardware).

Keep corpora small: the measurement relay adds ~30 ms per launch and fresh
kernel compiles can take minutes; this lane is a correctness gate, not a
benchmark (bench.py and experiments/ own throughput numbers).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("AMT_TPU_TESTS") != "1",
    reason="hardware lane: set AMT_TPU_TESTS=1 on a TPU host",
)


def _require_tpu():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (got {jax.default_backend()})")


@pytest.fixture(scope="module")
def setup100():
    _require_tpu()
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.bench.dataformat import synth_corpus

    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(110)
        )
    )[:100]
    needles[:4] = ["abc", "abcd", "bcd", "c"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 4 << 20, hit_fraction=0.01, seed=5)
    want = ac.count_matches(m, corpus[: 1 << 19])  # oracle on a slice
    return m, needles, corpus, want


def test_dense_kernel_hw():
    _require_tpu()
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
    from alfred_margaret_tpu.bench.dataformat import synth_corpus

    needles = ["tshirt", "shirts", "shorts"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 2 << 20, hit_fraction=0.01, seed=3)
    eng = PallasAcEngine(m)
    assert eng.count(corpus) == ac.count_matches(m, corpus)
    assert eng.contains(corpus) is True


def test_comb16_kernel_hw(setup100):
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine

    m, needles, corpus, want = setup100
    eng = Comb16PallasAcEngine(m)
    st = eng.stage(np.frombuffer(corpus, dtype=np.uint8))
    got = eng.count_staged(st)
    assert got == ac.count_matches(m, corpus)
    assert eng.contains_staged(st) is True


def test_comb32_kernel_hw(setup100):
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.comb_scan import CombPallasAcEngine

    m, needles, corpus, want = setup100
    eng = CombPallasAcEngine(m)
    assert eng.count(corpus) == ac.count_matches(m, corpus)


def test_match_extraction_hw(setup100):
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine

    m, needles, corpus, want = setup100
    sl = corpus[: 1 << 19]
    eng = Comb16PallasAcEngine(m)
    ends, vids = eng.matches_arrays(sl)
    oracle = ac.all_matches(m, sl)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value
        for e, v, o in zip(ends[:3000], vids[:3000], oracle[:3000])
    )


def test_bitap_kernel_hw():
    """Round-4 flagship on real hardware: bitap count/contains/presence at
    V=1 and V=2, counts vs the scalar oracle, plus a paired >= 1.2x-dense
    sustained-rate floor (the round-4 law: bitap wins every eligible V
    against the dense kernel in paired same-session runs)."""
    _require_tpu()
    import time

    import jax

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.bench.dataformat import synth_corpus
    from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine, plan_bitap
    from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

    # V=1 (3 needles) and V=2 (8 needles) layouts.
    sets = {
        1: ["tshirt", "shirts", "shorts"],
        2: ["tshirt", "shirts", "shorts", "boot", "scarf", "glove", "jeans", "vest"],
    }
    for v_want, needles in sets.items():
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = plan_bitap(m)
        assert lay is not None and lay.n_words == v_want
        corpus = synth_corpus(needles, 2 << 20, hit_fraction=0.01, seed=v_want)
        data = np.frombuffer(corpus, dtype=np.uint8)
        want = ac.count_matches(m, corpus)
        eng = BitapAcEngine(m, layout=lay)
        st = eng.stage(data)
        assert eng.count_staged(st) == want
        assert eng.contains_staged(st) is True
        pres = eng.needle_presence_staged(st)
        assert pres is not None
        oracle_pres = [n.encode() in corpus for n in needles]
        assert pres.tolist() == oracle_pres

    # Paired floor: sustained bitap rate >= 1.2x dense on the SAME corpus
    # in the SAME session (rep-slope cancels the relay round-trip).
    needles = sets[1]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 8 << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)

    R_HI = 2001  # ~16 GB of resident re-scans: >= ~30 ms of kernel even
    # at the bitap's light-load 600 GB/s, so the slope clears relay jitter

    def slope(eng):
        st = eng.stage(data)
        times = {}
        for reps in (1, R_HI):
            eng.count_staged(st, reps)  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                eng.count_staged(st, reps)
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        if times[R_HI] <= times[1]:
            return float("inf")  # jitter swallowed the delta
        return (R_HI - 1) * len(data) / (times[R_HI] - times[1])

    r_bitap = slope(BitapAcEngine(m))
    r_dense = slope(PallasAcEngine(m))
    if not (np.isfinite(r_bitap) and np.isfinite(r_dense)):
        return  # unmeasurable session; the correctness half above passed
    assert r_bitap >= 1.2 * r_dense, (r_bitap, r_dense)


def test_ci_bitap_kernel_hw():
    """CI bitap on real hardware: trapless byte-class tracks, embedded-trap
    layouts on clean corpora (no fallback), and a trap-firing corpus
    (localized recovery engaged, counts exact)."""
    _require_tpu()
    from alfred_margaret_tpu.models import ac, case_dfa
    from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine, plan_bitap_ci
    from alfred_margaret_tpu.utils import utf8
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    def composed(needles):
        low = [utf8.lower_str(n) for n in needles]
        m = ac.build([(n, i) for i, n in enumerate(low)])
        return m, case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)

    # Trapless: no i/k/å/ß letters anywhere in the needle closure.
    m, cm = composed(["dress", "glove"])
    lay = plan_bitap_ci(cm)
    assert lay is not None and not lay.has_trap
    hay = ("DRESS glove dReSs filler xx " * 20000).encode()
    eng = BitapAcEngine(cm, layout=lay)
    st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
    assert eng.count_staged(st) == ac.count_matches(m, hay, IGNORE_CASE)
    assert eng.contains_staged(st) is True

    # Trap-bearing layout, clean corpus: fast path, no fallback compile.
    m2, cm2 = composed(["kilo", "dress"])
    lay2 = plan_bitap_ci(cm2)
    assert lay2 is not None and lay2.has_trap
    clean = ("KILO dress kIlO filler " * 20000).encode()
    eng2 = BitapAcEngine(cm2, layout=lay2)
    st2 = eng2.stage(np.frombuffer(clean, dtype=np.uint8))
    assert eng2.count_staged(st2) == ac.count_matches(m2, clean, IGNORE_CASE)
    assert (st2.plan.time_len, 1) not in eng2._count_fn  # no dense fallback

    # ONE Kelvin site: the trap plane fires, localized host recovery keeps
    # the count exact without building the dense program.
    trap = bytearray(clean)
    mid = len(trap) // 2
    patch = "KILO".encode()  # Kelvin sign K
    trap[mid : mid + len(patch)] = patch
    trap = bytes(trap)
    st3 = eng2.stage(np.frombuffer(trap, dtype=np.uint8))
    assert eng2.count_staged(st3) == ac.count_matches(m2, trap, IGNORE_CASE)
    assert (st3.plan.time_len, 1) not in eng2._count_fn
    assert eng2.contains_staged(st3) is True


def test_comb16_chain_mode_hw(setup100):
    """The gather-free root/segment chains (round 5) must stay exact on
    real Mosaic where they engage, and must NOT engage past the measured
    10-boundary crossover (experiments/tpu_c16_chains.py: a 26-boundary
    chain was SLOWER than its gather)."""
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine

    m100, needles, corpus, want = setup100
    big = Comb16PallasAcEngine(m100)
    # config-2's 27-class root row has 26 boundaries: chains stay off.
    assert big._consts(big.c16)["root_pairs"] is None

    # Tiny alphabet -> few classes -> the root chain fits the cap.
    small_needles = ["abcab", "bcada", "cadbd", "dabca", "abdcb", "bacda"]
    m = ac.build([(n, i) for i, n in enumerate(small_needles)])
    eng = Comb16PallasAcEngine(m)
    C = eng._consts(eng.c16)
    assert C["root_pairs"] is not None and len(C["root_pairs"][1]) <= 10
    hay = (("abcab cadbd filler " * 4000) + "dabca").encode()
    data = np.frombuffer(hay, dtype=np.uint8)
    want2 = ac.count_matches(m, hay)
    st = eng.stage(data)
    got = eng.count_staged(st)
    assert got == want2
    os.environ["AMT_C16_CHAINS"] = "0"
    try:
        eng_off = Comb16PallasAcEngine(m)
        assert eng_off._consts(eng_off.c16)["root_pairs"] is None
        assert eng_off.count_staged(eng_off.stage(data)) == got
    finally:
        os.environ.pop("AMT_C16_CHAINS", None)


def test_contains_early_segments_hw():
    """Segmented early-exit containsAny on real Mosaic: the dynamic
    stream-row slice + sticky kernel must agree with the one-shot scan on
    hit-first / hit-last / no-hit corpora at forced segment counts."""
    _require_tpu()
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

    m = ac.build([(n, i) for i, n in enumerate(["needleword"])])
    eng = PallasAcEngine(m)
    base = b"x" * (2 << 20)
    for name, corpus in {
        "first": b"needleword" + base,
        "last": base + b"needleword",
        "none": base,
    }.items():
        st = eng.stage(np.frombuffer(corpus, dtype=np.uint8))
        want = eng.contains_staged(st)
        assert want == (b"needleword" in corpus), name
        for k in (2, 4):
            assert eng.contains_staged_early(st, n_segments=k) == want, (name, k)


def test_filter_contains_hw(setup100):
    """Hit-sparse containsAny screening on real Mosaic: no-hit corpora
    answer False straight from the filter (no fallback), hit corpora stay
    exact through the fallback."""
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
    from alfred_margaret_tpu.ops.filter_scan import filter_contains

    m, needles, corpus, want = setup100
    eng = Comb16PallasAcEngine(m)
    assert eng._filter_lay is not None
    miss = (("." * 63 + " ") * ((2 << 20) // 64)).encode()
    st = eng.stage(np.frombuffer(miss, dtype=np.uint8))
    assert filter_contains(eng, st) is False
    assert eng.contains_staged(st) is False
    st2 = eng.stage(np.frombuffer(corpus[: 2 << 20], dtype=np.uint8))
    assert eng.contains_staged(st2) is True


def test_fused_grouped_hw():
    """Fused single-launch grouped count + containsAny on a natural
    400-needle set: the partition must produce >= 2 uniform groups, the
    fused kernels must compile on real Mosaic (not just interpret mode),
    and counts must match the scalar oracle exactly."""
    _require_tpu()
    import random

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

    random.seed(400)
    needles = sorted(
        {
            "".join(random.choices("abcdefghijklmnop", k=random.randint(4, 14)))
            for _ in range(400)
        }
    )
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = (
        "".join(random.choices("abcdefghijklmnop ", k=1 << 19)) + needles[3] + needles[7]
    ).encode()
    expected = ac.count_matches(m, hay)
    eng = GroupedPallasAcEngine(m)
    assert eng._fused_setup() is not None, "fused count did not engage"
    assert eng.count(hay) == expected
    assert eng._fused_sticky_setup() is not None, "fused sticky did not engage"
    assert eng.contains(hay) == (expected > 0)
