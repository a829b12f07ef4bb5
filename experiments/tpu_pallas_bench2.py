import time, numpy as np, jax
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

rng = np.random.default_rng(3)
m = ac.build([(n, i) for i, n in enumerate(["tshirt","shirts","shorts"])])

words = [b"tshirt", b"shirts", b"shorts", b"banana", b"orange", b"peach!", b"grapes"]
corpus = rng.choice(len(words), size=100000)
block = b"".join(words[i] for i in corpus)
n_mb = 256
reps = (n_mb * 1024 * 1024) // len(block) + 1
hay = (block * reps)[: n_mb * 1024 * 1024]
print("corpus bytes:", len(hay), flush=True)

for (S, TT) in [(2048, 512), (4096, 256), (8192, 256), (1024, 1024)]:
    eng = PallasAcEngine(m, n_streams=S, t_tile=TT)
    t0 = time.perf_counter()
    got = eng.count(hay)
    t1 = time.perf_counter()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        got = eng.count(hay)
        best = min(best, time.perf_counter() - t0)
    print(f"S={S} TT={TT}: count={got} best={best:.3f}s  {len(hay)/best/1e9:.2f} GB/s e2e", flush=True)

# slice parity
sl = hay[:100000]
eng = PallasAcEngine(m, n_streams=2048, t_tile=512)
print("slice parity:", eng.count(sl), ac.count_matches(m, sl), flush=True)
