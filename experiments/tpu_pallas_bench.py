"""Pallas AC kernel on real TPU: correctness + sustained bytes/s."""
import time
import numpy as np
import jax
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

rng = np.random.default_rng(3)

# 3-needle README config
m = ac.build([(n, i) for i, n in enumerate(["tshirt","shirts","shorts"])])
eng = PallasAcEngine(m, n_streams=2048, t_tile=512)

hay_small = (b"short tshirts and shorts " * 100)
oracle = ac.count_matches(m, hay_small)
got = eng.count(hay_small)
print("small correctness:", got, oracle, "OK" if got == oracle else "FAIL", flush=True)

# 256 MB corpus with embedded needles
words = [b"tshirt", b"shirts", b"shorts", b"banana", b"orange", b"peach!", b"grapes"]
n_mb = 256
corpus = rng.choice(len(words), size=n_mb*1024*1024//6)
hay = np.concatenate([np.frombuffer(words[i], dtype=np.uint8) for i in corpus[:2000]])
# too slow to build that way; tile instead
block = b"".join(words[i] for i in corpus[:100000])
reps = (n_mb * 1024 * 1024) // len(block) + 1
hay = (block * reps)[: n_mb * 1024 * 1024]
print("corpus bytes:", len(hay), flush=True)

import alfred_margaret_tpu.models.ac as acmod
t0 = time.perf_counter()
got = eng.count(hay)
t1 = time.perf_counter()
print(f"first call (compile+run): {t1-t0:.2f}s count={got}", flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    got = eng.count(hay)
    t1 = time.perf_counter()
    print(f"count={got}  {t1-t0:.3f}s  {len(hay)/(t1-t0)/1e9:.2f} GB/s end-to-end", flush=True)

# verify count on a slice via oracle
sl = hay[:100000]
print("slice parity:", eng.count(sl), ac.count_matches(m, sl), flush=True)
