"""Hardware check of the PRODUCTION bitap engine (full stream plan, warm
masking, reps grid) + unroll tuning.

Run on the axon relay.  Verifies counts vs the native C++ DFA and prints
slope rates for count and contains at unroll 8 and 16.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops import bitap_scan
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = int(os.environ.get("PROBE_MB", "128"))


def slope(fn, n_bytes, r_lo=2, r_hi=602, rounds=6):
    np.asarray(fn(r_lo))
    np.asarray(fn(r_hi))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter(); fn(r_lo); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); fn(r_hi); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (r_hi - r_lo))
    return n_bytes / best, best


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    cpp = CppAcEngine(machine)
    exp = cpp.count(data)
    print(f"cpp count = {exp}", flush=True)

    for max_unroll in (8, 16):
        lay = bitap_scan.plan_bitap(machine, max_unroll=max_unroll)
        print(f"unroll={lay.unroll} words={[(hex(w.seed), w.fields) for w in lay.words]}", flush=True)
        eng = bitap_scan.BitapAcEngine(machine)
        eng.bitap = lay  # override layout for the tuning sweep
        eng._bitap_count = {}
        eng._bitap_contains = {}
        st = eng.stage(data)
        got = eng.count_staged(st)
        print(f"  count parity: {got} {'OK' if got == exp else 'MISMATCH'}",
              flush=True)
        n_scan = st.plan.time_len * eng.S
        rate, sl = slope(lambda r: eng.count_staged(st, reps=r), n_scan)
        print(f"  count:    {rate/1e9:.1f} GB/s (slope {sl*1e3:.3f} ms/rep, "
              f"T={st.plan.time_len})", flush=True)
        rate, sl = slope(lambda r: eng.contains_staged(st, reps=r), n_scan)
        print(f"  contains: {rate/1e9:.1f} GB/s", flush=True)

    # Multi-word regimes: V=2 and V=3 machines (expected ~linear
    # degradation in V; dense-kernel floor is ~165 GB/s).
    rng = np.random.default_rng(11)
    vocab = list("abcdefgh")
    for n_needles in (9, 14):
        needles = list(dict.fromkeys(
            "".join(rng.choice(vocab, size=int(rng.integers(5, 8))))
            for _ in range(n_needles + 4)
        ))[:n_needles]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = bitap_scan.plan_bitap(m)
        if lay is None:
            print(f"n={n_needles}: not bitap-eligible, skipped", flush=True)
            continue
        corpus_v = synth_corpus(needles, N_MB << 20, hit_fraction=0.01, seed=7)
        data_v = np.frombuffer(corpus_v, dtype=np.uint8)
        exp_v = CppAcEngine(m).count(data_v)
        eng = bitap_scan.BitapAcEngine(m)
        st = eng.stage(data_v)
        got = eng.count_staged(st)
        n_scan = st.plan.time_len * eng.S
        rate, sl = slope(lambda r: eng.count_staged(st, reps=r), n_scan)
        print(f"V={lay.n_words} ({n_needles} needles): count {rate/1e9:.1f} GB/s "
              f"parity {'OK' if got == exp_v else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
