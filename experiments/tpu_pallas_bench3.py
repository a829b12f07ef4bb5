"""Device-resident pallas kernel benchmark (excludes host->device transfer)."""
import time, numpy as np, jax, jax.numpy as jnp
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

rng = np.random.default_rng(3)
m = ac.build([(n, i) for i, n in enumerate(["tshirt","shirts","shorts"])])

words = [b"tshirt", b"shirts", b"shorts", b"banana", b"orange", b"peach!", b"grapes"]
block = b"".join(words[i] for i in rng.choice(len(words), size=100000))
n_mb = 64
reps = (n_mb * 1024 * 1024) // len(block) + 1
hay = np.frombuffer((block * reps)[: n_mb * 1024 * 1024], dtype=np.uint8)
print("corpus bytes:", len(hay), flush=True)

S, TT = 2048, 512
eng = PallasAcEngine(m, n_streams=S, t_tile=TT)
plan, streams_ts, warm, vend = eng._layout(hay)
print("plan:", plan, flush=True)
t0 = time.perf_counter()
streams_u8, warm_t, vend_t = eng._stream_arrays(streams_ts, warm, vend)
jax.block_until_ready(streams_u8)
print(f"host->device transfer: {time.perf_counter()-t0:.2f}s", flush=True)

fn = eng._get_count_fn(plan.time_len)
t0 = time.perf_counter()
counts = fn(eng._classmap_dev, eng._table_dev, warm_t, vend_t, streams_u8)
jax.block_until_ready(counts)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
got = int(np.asarray(counts, dtype=np.int64).sum())
print("count:", got, flush=True)

best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(eng._classmap_dev, eng._table_dev, warm_t, vend_t, streams_u8))
    best = min(best, time.perf_counter() - t0)
print(f"device-resident: {best:.3f}s  {len(hay)/best/1e9:.2f} GB/s", flush=True)

# oracle parity on a slice
sl = hay[:100000].tobytes()
print("slice parity:", eng.count(sl), ac.count_matches(m, sl), flush=True)
