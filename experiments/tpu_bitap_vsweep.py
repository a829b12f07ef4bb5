"""Paired V-sweep: bitap vs dense count rate per word count V in {1,2,3}.

Every bitap-eligible machine (<= 90 track bytes) has <= ~91 states, so its
dense table is single-row — the dense kernel runs at its stable ~170 GB/s
gather-issue floor regardless of V.  Bitap degrades ~linearly in V and its
absolute rate rides the chip's shared-HBM weather, so the paired ratio in
one process decides the dispatch crossover.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops import bitap_scan
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))


def slope(fn, r_lo=2, r_hi=402):
    t0 = time.perf_counter(); fn(r_lo); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); fn(r_hi); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (r_hi - r_lo)


def needle_set(target_words):
    rng = np.random.default_rng(100 + target_words)
    vocab = list("abcdefgh")
    needles = []
    total = 0
    budget = target_words * 30 - 4
    while total < budget - 8:
        n = "".join(rng.choice(vocab, size=int(rng.integers(5, 8))))
        if n not in needles and total + len(n) <= budget:
            needles.append(n)
            total += len(n)
    return needles


def main():
    for V in (1, 2, 3):
        needles = needle_set(V)
        machine = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = bitap_scan.plan_bitap(machine)
        assert lay is not None and lay.n_words == V, (V, lay and lay.n_words)
        corpus = synth_corpus(needles, N_MB << 20, hit_fraction=0.01, seed=7)
        data = np.frombuffer(corpus, dtype=np.uint8)
        exp = CppAcEngine(machine).count(data)

        eb = bitap_scan.BitapAcEngine(machine)
        ed = PallasAcEngine(machine)
        st_b = eb.stage(data)
        st_d = ed.stage(data)
        n_scan = st_b.plan.time_len * eb.S
        got_b, got_d = eb.count_staged(st_b), ed.count_staged(st_d)
        ok = "OK" if got_b == got_d == exp else f"MISMATCH {exp} {got_b} {got_d}"
        fb = lambda r: eb.count_staged(st_b, reps=r)
        fd = lambda r: ed.count_staged(st_d, reps=r)
        fb(402); fd(402)  # compile hi
        print(f"V={V} ({len(needles)} needles, "
              f"{sum(len(n) for n in needles)} bytes, "
              f"{machine.n_states} states) parity {ok}", flush=True)
        for i in range(ROUNDS):
            s_b, s_d = slope(fb), slope(fd)
            print(f"  round {i}: bitap {n_scan/s_b/1e9:6.1f} GB/s   "
                  f"dense {n_scan/s_d/1e9:6.1f} GB/s   "
                  f"bitap/dense speedup {s_d/s_b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
