"""Paired mid-tier crossover: bitap at V=4..8 vs the dispatcher's ladder.

Validates the word-budget formula in ``make_pallas_engine`` (bitap word ~
0.75 dependent-gather-equivalents, i.e. engage bitap while
V <= 4/3 * ladder_gather_cost): for each V, build a natural needle set
that packs into exactly V words, measure the forced-bitap engine against
whatever the ladder would run (AMT_BITAP=0 dispatch), paired in one
process so chip-load weather cancels.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops import bitap_scan
from alfred_margaret_tpu.ops.comb_scan import plan_pallas, make_pallas_engine
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))
V_SET = [int(v) for v in os.environ.get("V_SET", "4,5,6,8").split(",")]


def slope(fn, r_lo=2, r_hi=202):
    t0 = time.perf_counter(); fn(r_lo); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); fn(r_hi); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (r_hi - r_lo)


def needle_set(target_words):
    rng = np.random.default_rng(300 + target_words)
    vocab = list("abcdefghlmno")
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
    os.environ["AMT_BITAP"] = "0"  # ladder engines via normal dispatch
    for V in V_SET:
        needles = needle_set(V)
        machine = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = bitap_scan.plan_bitap(machine, max_words=V)
        assert lay is not None and lay.n_words == V, (V, lay and lay.n_words)
        kind, gcost = plan_pallas(machine)
        corpus = synth_corpus(needles, N_MB << 20, hit_fraction=0.01, seed=7)
        data = np.frombuffer(corpus, dtype=np.uint8)
        exp = CppAcEngine(machine).count(data)

        eb = bitap_scan.BitapAcEngine(machine, layout=lay)
        el = make_pallas_engine(machine)
        st_b, st_l = eb.stage(data), el.stage(data)
        n_scan = st_b.plan.time_len * eb.S
        got_b, got_l = eb.count_staged(st_b), el.count_staged(st_l)
        ok = "OK" if got_b == got_l == exp else f"MISMATCH {exp} {got_b} {got_l}"
        fb = lambda r: eb.count_staged(st_b, reps=r)
        fl = lambda r: el.count_staged(st_l, reps=r)
        fb(202); fl(202)
        print(f"V={V} ({len(needles)} needles, "
              f"{sum(len(n) for n in needles)} bytes, {machine.n_states} states) "
              f"ladder={type(el).__name__}[{kind} g={gcost}] parity {ok}",
              flush=True)
        for i in range(ROUNDS):
            s_b, s_l = slope(fb), slope(fl)
            print(f"  round {i}: bitap {n_scan/s_b/1e9:6.1f} GB/s   "
                  f"ladder {n_scan/s_l/1e9:6.1f} GB/s   "
                  f"bitap/ladder {s_l/s_b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
