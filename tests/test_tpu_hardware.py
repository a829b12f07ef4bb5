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
