"""Paired on-chip measurement: CI bitap vs composed dense kernel.

Two regimes:
  * trapless ASCII set (no i/k letters): V=1, one B-gather/byte — expect
    the plain bitap rate (~220 GB/s loaded, up to ~640 light).
  * trap-bearing set ('i' pulls the İ track): V=1 + trap word, two
    B-gathers/byte — expect ~the V=2 rate (~110 GB/s loaded).

Control: the composed dense kernel (PallasAcEngine on the same composed
machine) at its ~170 GB/s gather-issue floor.  Parity vs the native C++
engine on the raw composed machine.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac, case_dfa
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops import bitap_scan
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
from alfred_margaret_tpu.utils import utf8

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))


def slope(fn, r_lo=2, r_hi=402):
    t0 = time.perf_counter(); fn(r_lo); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); fn(r_hi); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (r_hi - r_lo)


def run_config(name, needles):
    low = [utf8.lower_str(n) for n in needles]
    m = ac.build([(n, i) for i, n in enumerate(low)])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    lay = bitap_scan.plan_bitap_ci(cm)
    assert lay is not None, name
    # mixed-case corpus: uppercase variants must actually hit the tracks
    rng = np.random.default_rng(17)
    corpus = synth_corpus(low, N_MB << 20, hit_fraction=0.01, seed=7)
    arr = bytearray(corpus)
    # flip ~half the ASCII letters to uppercase
    a = np.frombuffer(bytes(arr), dtype=np.uint8).copy()
    lett = (a >= 97) & (a <= 122)
    flip = lett & (rng.random(a.size) < 0.5)
    a[flip] -= 32
    data = a
    exp = CppAcEngine(cm).count(data)

    eb = bitap_scan.BitapAcEngine(cm, layout=lay)
    ed = PallasAcEngine(cm)
    st_b, st_d = eb.stage(data), ed.stage(data)
    n_scan = st_b.plan.time_len * eb.S
    got_b, got_d = eb.count_staged(st_b), ed.count_staged(st_d)
    ok = "OK" if got_b == got_d == exp else f"MISMATCH {exp} {got_b} {got_d}"
    fb = lambda r: eb.count_staged(st_b, reps=r)
    fd = lambda r: ed.count_staged(st_d, reps=r)
    fb(402); fd(402)
    print(f"{name}: V={lay.n_words} trap={'yes' if lay.trap else 'no'} "
          f"(composed {cm.n_states} states) count={got_b} parity {ok}", flush=True)
    for i in range(ROUNDS):
        s_b, s_d = slope(fb), slope(fd)
        print(f"  round {i}: ci-bitap {n_scan/s_b/1e9:6.1f} GB/s   "
              f"composed-dense {n_scan/s_d/1e9:6.1f} GB/s   "
              f"speedup {s_d/s_b:.2f}x", flush=True)


def main():
    run_config("trapless", ["dress", "shoe", "glove"])
    run_config("trap-i", ["tshirt", "shirts", "shorts"])


if __name__ == "__main__":
    main()
