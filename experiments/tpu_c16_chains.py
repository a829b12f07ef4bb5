"""Paired A/B: comb16 with gather-free root/segment chains vs the 2-extra-
gather baseline, on the config-2 machine (100 needles, ~440 minimized
states, rows_c=3 rows_a=1).

Chains drop the per-byte gather count from 6 to 4; the measured law
(~165 GB/s per gather/byte under load) predicts 25 -> ~41 GB/s.  Both
variants run in the SAME session on the SAME staged corpus with rep-slope
timing (the ~30 ms relay round trip and its jitter cancel; every run
materializes the result to host because block_until_ready does not block
on the axon relay).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "5"))
R_HI = int(os.environ.get("PROBE_RHI", "101"))


def log(msg):
    print(msg, flush=True)


def slope(eng, st, n_eff):
    times = {}
    for reps in (1, R_HI):
        eng.count_staged(st, reps)  # warm/compile
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            eng.count_staged(st, reps)
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    dt = times[R_HI] - times[1]
    rate = (R_HI - 1) * n_eff / dt if dt > 0 else float("nan")
    return rate, times


def main():
    import jax

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.bench.dataformat import synth_corpus
    from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine

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
    corpus = synth_corpus(needles, N_MB << 20, hit_fraction=0.01, seed=5)
    data = np.frombuffer(corpus, dtype=np.uint8)
    want = None

    for label, env in (("chains", None), ("baseline", "0"), ("chains2", None)):
        if env is None:
            os.environ.pop("AMT_C16_CHAINS", None)
        else:
            os.environ["AMT_C16_CHAINS"] = env
        eng = Comb16PallasAcEngine(m)
        C = eng._consts(eng.c16)
        g = C["rows_c"] + C["rows_a"] + (C["root_pairs"] is None) + (
            C["seg_pairs"] is None
        )
        st = eng.stage(data)
        got = eng.count_staged(st)
        if want is None:
            want = ac.count_matches(m, corpus[: 1 << 20])
            assert eng.count_staged(eng.stage(np.frombuffer(corpus[: 1 << 20], dtype=np.uint8))) == want
        rate, times = slope(eng, st, len(data))
        log(
            f"{label:9s} g={g} count={got} slope {rate/1e9:6.1f} GB/s  "
            f"t1 {times[1]*1e3:7.2f} ms t{R_HI} {times[R_HI]*1e3:8.2f} ms"
        )
    os.environ.pop("AMT_C16_CHAINS", None)


if __name__ == "__main__":
    main()
