"""Device validation + rate for the absorbing-state contains kernel, plus
a count-kernel variance rerun (post-wruns)."""
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = 128

machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
eng = PallasAcEngine(machine)

# correctness: with and without matches, match only at the very end
rng = np.random.default_rng(5)
noise = rng.choice(np.frombuffer(b"xyzw ", dtype=np.uint8), size=1 << 22)
hay_no = noise.tobytes()
hay_end = hay_no[:-6] + b"tshirt"
hay_yes = synth_corpus(NEEDLES, 1 << 22, hit_fraction=0.001, seed=9)
for name, hay, want in [
    ("no-match", hay_no, False),
    ("match-at-end", hay_end, True),
    ("sparse-matches", hay_yes, True),
]:
    got = eng.contains(hay)
    print(f"contains {name}: {got} (want {want}) {'OK' if got == want else 'WRONG'}")

# rate: slope between reps on the big corpus
corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
data = np.frombuffer(corpus, dtype=np.uint8)
st = eng.stage(data)


def slope(fn, label):
    best = {}
    for reps in (2, 34):
        fn(reps)  # warmup/compile
        b = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            fn(reps)
            b = min(b, time.perf_counter() - t0)
        best[reps] = b
    bps = (34 - 2) * len(data) / (best[34] - best[2])
    print(f"{label}: {bps/1e9:.1f} GB/s (t2={best[2]*1e3:.1f}ms t34={best[34]*1e3:.1f}ms)")


slope(lambda r: eng.count_staged(st, r), "count kernel rerun")
slope(lambda r: eng.contains_staged(st, r), "contains kernel")
