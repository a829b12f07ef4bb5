"""comb16 (16-bit three-tier comb) kernel vs comb32 on hardware.

The scan loop is gather-throughput-bound (~165 GB/s per gather/byte); the
comb16 layout costs rows_c + rows_a + 2 gathers vs comb32's
rows_c + rows_d (+1 classmap when wruns is off).  For config-2-like
100-needle machines that's 6 vs 12 -> expect ~2x.

Usage: python tpu_comb16_bench.py [n_needles ...]
"""
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.comb_scan import CombPallasAcEngine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine, build_comb16
from alfred_margaret_tpu.native import cpp_engine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def sustained(eng, st, n_bytes, target_s=1.2):
    """reps-grid measurement: one launch re-reading resident tiles."""
    t0 = time.perf_counter()
    c1 = eng.count_staged(st)
    print(f"  compile+first: {time.perf_counter()-t0:.0f}s count={c1}", flush=True)
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
    sizes = [int(x) for x in (sys.argv[1:] or [100, 300])]
    rng = np.random.default_rng(7)
    for n_needles in sizes:
        needles = list(
            dict.fromkeys(
                "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
                for _ in range(n_needles + 10)
            )
        )[:n_needles]
        if n_needles == 100:
            needles[:4] = ["abc", "abcd", "bcd", "c"]  # config-2 exact mix
        machine = ac.build([(n, i) for i, n in enumerate(needles)])
        corpus = synth_corpus(needles, 64 * MB, hit_fraction=0.01, seed=5)
        data = np.frombuffer(corpus, dtype=np.uint8)
        expected = cpp_engine.CppAcEngine(machine).count(data)
        print(f"== {n_needles} needles: states={machine.n_states} expected={expected}", flush=True)
        try:
            c16 = build_comb16(machine)
            print(f"  comb16: rows_c={c16.rows_c} rows_a={c16.rows_a} gathers={c16.rows_total} "
                  f"CB={c16.CB} OB={c16.OB} BB={c16.BB}", flush=True)
            eng16 = Comb16PallasAcEngine(machine, c16=c16)
            st = eng16.stage(data)
            gbs, reps, c1 = sustained(eng16, st, len(data))
            ok = "OK" if c1 == expected else f"MISMATCH({c1})"
            print(f"  comb16: {gbs:.1f} GB/s (reps={reps}) {ok}", flush=True)
        except Exception as e:
            print(f"  comb16 failed: {type(e).__name__}: {e}", flush=True)
            st = None
        try:
            eng32 = CombPallasAcEngine(machine)
            if st is None:
                st = eng32.stage(data)
            print(f"  comb32: rows={eng32.comb.rows_total}", flush=True)
            gbs, reps, c1 = sustained(eng32, st, len(data))
            ok = "OK" if c1 == expected else f"MISMATCH({c1})"
            print(f"  comb32: {gbs:.1f} GB/s (reps={reps}) {ok}", flush=True)
        except Exception as e:
            print(f"  comb32 failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
