"""Paired on-chip A/B: the stride-2 sticky filter (hit-sparse containsAny
screen) vs the comb16 exact sticky scan, on the config-2 machine.

The filter costs V single-row gathers per PAIR (V/2 gathers/byte) plus
rolling compares; comb16 sticky costs ~g gathers/byte.  On a no-hit corpus
the filter alone answers False — the common blocklist-serving verdict —
so the paired slope ratio is the production speedup for that regime.
Rep-slope timing in one session; every run materializes its result
(block_until_ready does not block on the axon relay).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "5"))


def log(msg):
    print(msg, flush=True)


def slope(fn, n_eff, r_hi):
    times = {}
    for reps in (1, r_hi):
        fn(reps)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            fn(reps)
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    dt = times[r_hi] - times[1]
    return ((r_hi - 1) * n_eff / dt if dt > 0 else float("nan")), times


def main():
    import jax

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
    from alfred_margaret_tpu.ops.filter_scan import filter_contains

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(110)
        )
    )[:100]
    needles[:4] = ["abc", "abcd", "bcd", "c"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = Comb16PallasAcEngine(m)
    lay = eng._filter_lay
    assert lay is not None
    log(f"filter: V={lay.n_words} words, {len(lay.shorts)} short compares")

    # No-hit corpus: no a-z at all (the screen's pure-negative regime).
    miss = (("." * 63 + " ") * ((N_MB << 20) // 64)).encode()
    data = np.frombuffer(miss, dtype=np.uint8)
    st = eng.stage(data)
    assert filter_contains(eng, st) is False

    # The filter has no reps grid; amortize by scanning r staged corpora
    # worth of T via repeated calls (per-call RTT cancels in the slope
    # between 1 and r sequential calls dispatched back-to-back).
    def filter_calls(r):
        outs = [
            eng._filter_fns[st.plan.time_len](
                st._bscal_strict, eng._filter_btab, st.vend_t, st.streams_dev
            )
            for _ in range(r)
        ]
        np.asarray(outs[-1])

    def sticky_calls(r):
        c = eng._sticky_setup()
        fn = eng._get_contains_fn(st.plan.time_len, 1)
        outs = [
            fn(eng._bscal_for(st), c["cm"], c["comb_dev"], c["aux_dev"],
               c["rootseg_dev"], st.vend_t, st.streams_dev)
            for _ in range(r)
        ]
        np.asarray(outs[-1])

    r_f = max(9, int(300e9 * 0.05 / (N_MB << 20)) | 1)
    r_s = max(5, int(30e9 * 0.05 / (N_MB << 20)) | 1)
    rate_f, t_f = slope(filter_calls, N_MB << 20, r_f)
    log(f"filter  sticky slope {rate_f/1e9:6.1f} GB/s  "
        f"t1 {t_f[1]*1e3:6.2f} ms t{r_f} {t_f[r_f]*1e3:8.2f} ms")
    rate_s, t_s = slope(sticky_calls, N_MB << 20, r_s)
    log(f"comb16  sticky slope {rate_s/1e9:6.1f} GB/s  "
        f"t1 {t_s[1]*1e3:6.2f} ms t{r_s} {t_s[r_s]*1e3:8.2f} ms  "
        f"filter/comb16 = {rate_f/rate_s:5.2f}x")

    # Verdict checks on chip: hit corpora exact through the fallback.
    from alfred_margaret_tpu.bench.dataformat import synth_corpus

    hits = synth_corpus(needles, 4 << 20, hit_fraction=0.01, seed=5)
    st2 = eng.stage(np.frombuffer(hits, dtype=np.uint8))
    assert eng.contains_staged(st2) is True
    assert eng.contains_staged(st) is False
    log("verdicts exact (hit corpus True via fallback, miss corpus False "
        "from the screen alone)")


if __name__ == "__main__":
    main()
