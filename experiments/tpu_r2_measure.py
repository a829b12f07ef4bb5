"""Round-2 consolidated hardware measurement (run when the relay is up).

1. comb16 count vs comb32 — config-2 needles (the direct-int32 root row —
   "root32" — is the production comb16 design being measured here).
2. Match-bitmap extraction wall time vs count_staged (target <= 2x).
3. Headline 3-needle dense kernel sanity (should stay ~163 GB/s).

Slope methodology per experiments/README.md (two rep-grid sizes, best-of-5).
"""
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.ops.comb_scan import CombPallasAcEngine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine, build_comb16
from alfred_margaret_tpu.native import cpp_engine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def slope(fn_reps, n_bytes, r1=2, r2=66, rounds=7):
    """Rate from the rep-count slope.  The relay RTT jitters by ~10 ms
    between synced dispatches, so the slope denominator (r2-r1 reps of
    device work) must dwarf it — r2=34 measurably produced NEGATIVE dense
    slopes (device work per rep ~0.4 ms); r2=66 puts >=25 ms of real work
    between the two points for every kernel family measured here."""
    fn_reps(1)  # compile + warm
    fn_reps(r1)
    fn_reps(r2)
    b1 = b2 = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter(); fn_reps(r1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn_reps(r2); b2 = min(b2, time.perf_counter() - t0)
    return n_bytes / ((b2 - b1) / (r2 - r1)) / 1e9


def main():
    rng = np.random.default_rng(7)
    needles = list(dict.fromkeys(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
        for _ in range(110)))[:100]
    needles[:4] = ["abc", "abcd", "bcd", "c"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 64 * MB, hit_fraction=0.01, seed=5)
    data = np.frombuffer(corpus, dtype=np.uint8)
    expected = cpp_engine.CppAcEngine(m).count(data)
    print(f"== config-2 needles: S={m.n_states} expected={expected}", flush=True)

    c16 = build_comb16(m)
    print(f"comb16: gathers={c16.rows_total} (rows_c={c16.rows_c} rows_a={c16.rows_a})", flush=True)
    eng16 = Comb16PallasAcEngine(m, c16=c16)
    st = eng16.stage(data)
    assert eng16.count_staged(st) == expected, "comb16 count mismatch"
    gbs = slope(lambda r: eng16.count_staged(st, r), len(data))
    print(f"comb16 count: {gbs:.1f} GB/s", flush=True)

    # Bitmap match extraction vs count (hit density here ~0.17%).
    t0 = time.perf_counter(); n1 = eng16.count_staged(st); t_cnt = time.perf_counter() - t0
    t0 = time.perf_counter(); pos, states = eng16.match_positions_staged(st); t_m1 = time.perf_counter() - t0
    t0 = time.perf_counter(); pos, states = eng16.match_positions_staged(st); t_m = min(t_m1, time.perf_counter() - t0)
    # pos has ONE entry per hit position; total matches = sum of the hit
    # states' output counts (states with match_count > 1 emit several).
    n_matches = int(m.match_count[states].sum())
    assert n_matches == expected == n1, (n_matches, expected, n1)
    print(f"bitmap matches: {t_m*1e3:.1f} ms vs count {t_cnt*1e3:.1f} ms "
          f"(ratio {t_m/max(t_cnt,1e-9):.2f}; first-call {t_m1*1e3:.0f} ms)", flush=True)

    eng32 = CombPallasAcEngine(m)
    assert eng32.count_staged(st) == expected
    gbs32 = slope(lambda r: eng32.count_staged(st, r), len(data))
    print(f"comb32 count: {gbs32:.1f} GB/s", flush=True)

    # Headline sanity.
    n3 = ["tshirt", "shirts", "shorts"]
    m3 = ac.build([(n, i) for i, n in enumerate(n3)])
    c3 = synth_corpus(n3, 64 * MB, hit_fraction=0.01, seed=3)
    d3 = np.frombuffer(c3, dtype=np.uint8)
    e3 = PallasAcEngine(m3)
    st3 = e3.stage(d3)
    exp3 = cpp_engine.CppAcEngine(m3).count(d3)
    assert e3.count_staged(st3) == exp3
    # Dense is ~0.4 ms/rep at 64 MiB: needs the widest rep spread of all.
    print(f"dense 3-needle: {slope(lambda r: e3.count_staged(st3, r), len(d3), r2=258):.1f} GB/s", flush=True)

    # Sticky contains on the config-2 machine (count-minimized sticky view).
    eng16.contains_staged(st)
    gbs_c = slope(lambda r: eng16.contains_staged(st, r), len(data))
    print(f"comb16 contains: {gbs_c:.1f} GB/s", flush=True)

    # Grouped 1000-needle count: count-minimized adaptive plan (47 summed
    # gathers vs 58 unminimized -> expect ~3.5 GB/s staged vs ~2.8).
    from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

    ns1k = list(dict.fromkeys(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
        for _ in range(1060)))[:1000]
    m1k = ac.build([(n, i) for i, n in enumerate(ns1k)])
    c1k = synth_corpus(ns1k, 64 * MB, hit_fraction=0.01, seed=9)
    d1k = np.frombuffer(c1k, dtype=np.uint8)
    exp1k = cpp_engine.CppAcEngine(m1k).count(d1k)
    g1k = GroupedPallasAcEngine(m1k)
    print(f"grouped 1k: groups={g1k.n_groups} rows={g1k.total_rows}", flush=True)
    st1k = g1k._stage(d1k)
    assert g1k.count_staged(st1k) == exp1k, "grouped 1k count mismatch"
    print(f"grouped 1k fused: {g1k._fused is not None}", flush=True)
    gbs1k = slope(lambda r: g1k.count_staged(st1k, r), len(d1k), r2=10)
    print(f"grouped 1k count (fused single launch): {gbs1k:.2f} GB/s", flush=True)
    if g1k._fused is not None:
        # Per-group multi-launch comparison (the pre-fusion path).  Warm
        # every per-group compile first so the comparison times launches,
        # not JIT (per the slope() convention).
        got = sum(e.count_staged(st1k) for e in g1k.engines)
        assert got == exp1k
        g1k.count_staged(st1k)
        t_multi = t_fused = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            sum(e.count_staged(st1k) for e in g1k.engines)
            t_multi = min(t_multi, time.perf_counter() - t0)
            t0 = time.perf_counter()
            g1k.count_staged(st1k)
            t_fused = min(t_fused, time.perf_counter() - t0)
        print(f"grouped 1k one-shot wall: fused {t_fused*1e3:.0f} ms vs "
              f"multi-launch {t_multi*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
