"""Differential soak: random needle sets/corpora across engine paths.

Compares, per trial: scalar oracle count vs C++ engine vs comb16
(interpret) vs grouped-fused (interpret) vs distributed mesh (xla inner),
plus matches_arrays parity on one path. Runs until killed; prints one
line per trial batch; any mismatch raises loudly.
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine
from alfred_margaret_tpu.ops.pallas_scan import CapacityError
from alfred_margaret_tpu.parallel import DistributedAcEngine, make_mesh

t0 = time.time()
trial = 0
MESH = make_mesh(jax.devices()[:4], data=2, seq=1, needle=2)
while True:
    trial += 1
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(3, 200))
    alpha_lo, alpha_hi = (97, 105) if rng.random() < 0.5 else (97, 123)
    needles = list(dict.fromkeys(
        bytes(rng.integers(alpha_lo, alpha_hi, size=rng.integers(1, 9), dtype=np.uint8).tobytes())
        for _ in range(n + 10)))[:n]
    if rng.random() < 0.2:
        needles.append(needles[0])  # duplicate
    if rng.random() < 0.15:
        needles.append(b"\x00" + needles[0][:2])  # NUL needle
    m = ac.build([(x, i) for i, x in enumerate(needles)])
    frags = [x for x in needles[:15]] + [bytes(rng.integers(alpha_lo, alpha_hi+2, size=9, dtype=np.uint8).tobytes())]
    hay = b"".join(frags[i] for i in rng.integers(0, len(frags), int(rng.integers(50, 900))))
    expected = ac.count_matches(m, hay)
    got_cpp = CppAcEngine(m).count(np.frombuffer(hay, dtype=np.uint8))
    assert got_cpp == expected, (trial, "cpp", got_cpp, expected)
    # comb16 interpret (single pass) when it fits
    try:
        e16 = Comb16PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True)
        got = e16.count(hay)
        assert got == expected, (trial, "comb16", got, expected)
        c = e16.contains(hay)
        assert c == (expected > 0), (trial, "comb16-contains")
        ends, vids = e16.matches_arrays(hay)
        oracle = ac.all_matches(m, hay)
        assert len(ends) == len(oracle) and all(
            int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
        ), (trial, "comb16-matches")
    except CapacityError:
        pass
    # grouped fused
    try:
        ge = GroupedPallasAcEngine(m, max_rows=5, n_streams=256, t_tile=64, interpret=True, unroll=4)
        got = ge.count(hay)
        assert got == expected, (trial, "grouped", got, expected, ge._fused is not None)
        gc = ge.contains(hay)
        assert gc == (expected > 0), (trial, "grouped-contains", ge._fused_sticky_setup() is not None)
    except CapacityError:
        pass
    # distributed xla inner on the virtual mesh
    de = DistributedAcEngine(m, MESH, inner="xla")
    got = de.count(hay)
    assert got == expected, (trial, "dist", got, expected)
    if trial % 10 == 0:
        print(f"[soak] {trial} trials OK ({time.time()-t0:.0f}s)", flush=True)
    if trial % 50 == 0:
        jax.clear_caches()  # per-trial machines would grow the jit cache unboundedly
