"""Where does match_positions_staged (bitmap path) spend its time?

Breaks the comb16 bitmap extraction into stages and times each on the live
chip: bits kernel, device word-nonzero, device->host transfers, host bit
expansion, host state re-derivation, final sort.  Drives the round-3 work
of bringing extraction within 2x of count_staged (VERDICT r2 item 5).
"""
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.pallas_scan import (
    expand_hit_bits,
    states_at_positions,
)
from alfred_margaret_tpu.native import cpp_engine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def t(fn, rounds=3):
    fn()
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(hit_fraction=0.01, size_mb=64, short_needles=True):
    rng = np.random.default_rng(7)
    needles = list(dict.fromkeys(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
        for _ in range(110)))[:100]
    if short_needles:
        # config-2's seeds; note "c" matches ~3.8% of random a-z text, so
        # hit density floors near 3% no matter how small hit_fraction is.
        needles[:4] = ["abc", "abcd", "bcd", "c"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, size_mb * MB, hit_fraction=hit_fraction, seed=5)
    data = np.frombuffer(corpus, dtype=np.uint8)
    expected = cpp_engine.CppAcEngine(m).count(data)
    eng = Comb16PallasAcEngine(m)
    st = eng.stage(data)
    assert eng.count_staged(st) == expected
    t_cnt = t(lambda: eng.count_staged(st))
    print(f"hit_fraction={hit_fraction} size={size_mb}MiB matches={expected} "
          f"({expected / len(data) * 100:.2f}% of positions)", flush=True)
    print(f"count_staged:        {t_cnt*1e3:8.1f} ms", flush=True)

    # Stage 1: fused bits kernel + in-jit word nonzero (ONE dispatch)
    import jax
    S = eng.S
    nwords = (st.plan.time_len // 32) * S
    # Probe once with a small cap to learn n, then time at the right cap
    # (the production path does the same via its cap hint).
    fn0 = eng._get_bits_fn(st.plan.time_len, 1 << 14, 1 << 12)
    bits_args = (eng._bscal_for(st), *eng._bits_tables()[0], st.warm_t, st.vend_t, st.streams_dev)
    a0 = np.asarray(fn0(*bits_args)[1])
    n, nb = int(a0[0, -1]), int(a0[1, -1])
    cap = 1 << int(np.ceil(np.log2(n + 1)))
    bcap = 1 << int(np.ceil(np.log2(nb + 1)))
    fn = eng._get_bits_fn(st.plan.time_len, cap, bcap)
    # NOTE: block_until_ready does NOT wait for compute on the relay —
    # only a real fetch does, so every timing below fetches.
    t_xfer = t(lambda: np.asarray(fn(*bits_args)[1]))
    ww = np.asarray(fn(*bits_args)[1])
    widx = ww[0, :n].astype(np.int64)
    wval = ww[1, :n]
    print(f"dispatch+fetch:      {t_xfer*1e3:8.1f} ms   (cap={cap} n={n} bcap={bcap} nb={nb}; one [2,cap+1] array)", flush=True)

    warm = st.warm_np.astype(np.int64)
    vend = np.asarray(st.vend_t).reshape(-1).astype(np.int64)
    t_exp = t(lambda: expand_hit_bits(widx // S, widx % S, wval, warm, vend, st.plan.emit_len))
    pos = expand_hit_bits(widx // S, widx % S, wval, warm, vend, st.plan.emit_len)
    print(f"host bit expand:     {t_exp*1e3:8.1f} ms   ({len(pos)} positions)", flush=True)

    t_st = t(lambda: states_at_positions(eng.machine, st.data_np, pos))
    states = states_at_positions(eng.machine, st.data_np, pos)
    print(f"host states replay:  {t_st*1e3:8.1f} ms   (W={eng.machine.max_needle_bytes})", flush=True)

    t_sort = t(lambda: np.argsort(pos, kind="stable"))
    print(f"host argsort:        {t_sort*1e3:8.1f} ms", flush=True)

    t_all = t(lambda: eng.match_positions_staged(st), rounds=2)
    print(f"TOTAL path:          {t_all*1e3:8.1f} ms   ratio vs count: {t_all/t_cnt:.1f}x", flush=True)
    n_m = int(m.match_count[states].sum())
    assert n_m == expected, (n_m, expected)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--hit-fraction", type=float, default=0.01)
    p.add_argument("--size-mb", type=int, default=64)
    p.add_argument("--no-short", action="store_true",
                   help="drop the 1-3 byte seed needles (hit-sparse runs)")
    a = p.parse_args()
    main(a.hit_fraction, a.size_mb, short_needles=not a.no_short)
