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


def sustained(eng, st, n_bytes, r1=2, r2=34):
    """Two-size slope: (t(r2) - t(r1)) / (r2 - r1) cancels launch RTT and
    relay jitter (best-of-5 per size, per the axon measurement rules)."""
    t0 = time.perf_counter()
    c1 = eng.count_staged(st)
    print(f"  compile+first: {time.perf_counter()-t0:.0f}s count={c1}", flush=True)
    eng.count_staged(st, r1)  # warm both rep-grid compiles
    eng.count_staged(st, r2)
    best1 = best2 = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        a = eng.count_staged(st, r1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        b = eng.count_staged(st, r2)
        best2 = min(best2, time.perf_counter() - t0)
        assert a == c1 * r1 and b == c1 * r2
    per_rep = (best2 - best1) / (r2 - r1)
    return n_bytes / per_rep / 1e9, r2, c1


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
