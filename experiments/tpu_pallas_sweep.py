import time, numpy as np, jax
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

rng = np.random.default_rng(3)
m = ac.build([(n, i) for i, n in enumerate(["tshirt","shirts","shorts"])])
words = [b"tshirt", b"shirts", b"shorts", b"banana", b"orange", b"peach!", b"grapes"]
block = b"".join(words[i] for i in rng.choice(len(words), size=100000))
n_mb = 64
reps = (n_mb * 1024 * 1024) // len(block) + 1
hay = np.frombuffer((block * reps)[: n_mb * 1024 * 1024], dtype=np.uint8)

expected = None
for (S, TT, UN) in [(4096, 256, 4), (8192, 128, 4), (16384, 64, 4), (8192, 128, 1)]:
    eng = PallasAcEngine(m, n_streams=S, t_tile=TT, unroll=UN)
    plan, streams_ts, warm, vend = eng._layout(hay)
    streams_u8, warm_t, vend_t = eng._stream_arrays(streams_ts, warm, vend)
    fn = eng._get_count_fn(plan.time_len)
    counts = fn(eng._classmap_dev, eng._table_dev, warm_t, vend_t, streams_u8)
    got = int(np.asarray(counts, dtype=np.int64).sum())
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(eng._classmap_dev, eng._table_dev, warm_t, vend_t, streams_u8))
        best = min(best, time.perf_counter() - t0)
    ok = "OK" if (expected is None or got == expected) else f"MISMATCH vs {expected}"
    expected = expected or got
    print(f"S={S} TT={TT} UN={UN}: count={got} {ok}  {best:.3f}s  {len(hay)/best/1e9:.2f} GB/s", flush=True)
