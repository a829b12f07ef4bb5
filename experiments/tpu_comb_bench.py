"""Comb (row-displacement) kernel vs dense select-chain on hardware.

Mid-tier needle counts (100-3000) are where the dense kernel's ~165/rows
GB/s collapses; the comb build showed 5-9x fewer rows host-side.  This
measures real sustained GB/s for both engines on the same machine + corpus,
verifying counts against the host C++ engine.

Usage: python tpu_comb_bench.py [n_needles ...]
"""
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import CapacityError, PallasAcEngine
from alfred_margaret_tpu.ops.comb_scan import CombPallasAcEngine, build_comb
from alfred_margaret_tpu.native import cpp_engine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def sustained(eng, st, n_bytes, target_s=1.2):
    """reps-grid measurement: one launch re-reading resident tiles."""
    t0 = time.perf_counter()
    c1 = eng.count_staged(st)
    print(f"  compile+first: {time.perf_counter()-t0:.0f}s count={c1}", flush=True)
    # pick reps so a single launch runs ~target_s
    t0 = time.perf_counter()
    eng.count_staged(st)
    per = time.perf_counter() - t0
    reps = max(1, min(256, int(target_s / max(per - 0.03, 1e-3))))
    t0 = time.perf_counter()
    c2 = eng.count_staged(st, reps)
    dt = time.perf_counter() - t0
    assert c2 == c1 * reps or reps == 1, (c2, c1, reps)
    best = dt
    for _ in range(2):
        t0 = time.perf_counter()
        eng.count_staged(st, reps)
        best = min(best, time.perf_counter() - t0)
    return n_bytes * reps / best / 1e9, reps, c1


def main():
    sizes = [int(x) for x in (sys.argv[1:] or [100, 300, 1000, 3000])]
    rng = np.random.default_rng(11)
    for n_needles in sizes:
        needles = list(
            dict.fromkeys(
                "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 11)))
                for _ in range(n_needles * 2)
            )
        )[:n_needles]
        machine = ac.build([(n, i) for i, n in enumerate(needles)])
        corpus = synth_corpus(needles, 64 * MB, hit_fraction=0.005, seed=3)
        data = np.frombuffer(corpus, dtype=np.uint8)
        expected = cpp_engine.CppAcEngine(machine).count(data)
        print(f"== {n_needles} needles: states={machine.n_states} expected={expected}",
              flush=True)

        try:
            cm = build_comb(machine)
        except CapacityError as e:
            # Doesn't fit one pass: adaptive needle-grouped multi-pass.
            from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

            g = GroupedPallasAcEngine(machine)
            print(f"  grouped: {g.n_groups} passes, total_rows={g.total_rows}",
                  flush=True)
            st = g.engines[0].stage(data)
            gbs, reps, got = sustained(g, st, len(data))
            assert got == expected, (got, expected)
            print(f"  GROUPED {n_needles}: {gbs:.2f} GB/s (reps={reps})", flush=True)
            continue
        print(f"  comb: rows_c={cm.rows_c} rows_d={cm.rows_d} D={cm.D} "
              f"k={cm.k} exc={cm.n_exceptions}", flush=True)
        eng_c = CombPallasAcEngine(machine, comb=cm)
        st = eng_c.stage(data)
        gbs, reps, got = sustained(eng_c, st, len(data))
        assert got == expected, (got, expected)
        print(f"  COMB {n_needles}: {gbs:.2f} GB/s (reps={reps})", flush=True)

        try:
            eng_d = PallasAcEngine(machine)
        except CapacityError as e:
            print(f"  dense: over capacity ({e})", flush=True)
            continue
        print(f"  dense: rows={eng_d.comp.rows} packing={eng_d.comp.packing}", flush=True)
        st_d = eng_d.stage(data)
        gbs_d, reps_d, got_d = sustained(eng_d, st_d, len(data))
        assert got_d == expected, (got_d, expected)
        print(f"  DENSE {n_needles}: {gbs_d:.2f} GB/s (reps={reps_d})  "
              f"speedup={gbs/gbs_d:.1f}x", flush=True)


if __name__ == "__main__":
    main()
