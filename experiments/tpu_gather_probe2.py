import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1024
T = 65536          # 64 MiB total
N_STATES = 64

rng = np.random.default_rng(0)
delta = rng.integers(0, N_STATES, size=(N_STATES, 256), dtype=np.int32)
match_count = (rng.random(N_STATES) < 0.05).astype(np.int32)
streams = rng.integers(0, 256, size=(T, S), dtype=np.uint8)

delta_flat = jnp.asarray(delta.reshape(-1))
mc = jnp.asarray(match_count)
streams_d = jnp.asarray(streams)
total_bytes = T * S

# CPU truth on a few streams
def cpu_count():
    states = np.zeros(S, dtype=np.int64)
    counts = np.zeros(S, dtype=np.int64)
    d = delta
    for t in range(T//64):  # only first T/64 steps for speed
        states = d[states, streams[t].astype(np.int64)]
        counts += match_count[states]
    return counts.sum()

@jax.jit
def xla_count_partial(delta_flat, mc, streams):
    def step(carry, byte_row):
        states, counts = carry
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        counts = counts + jnp.take(mc, states)
        return (states, counts), None
    (s, c), _ = jax.lax.scan(step, (jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32)), streams)
    return c.sum()

truth = cpu_count()
got = int(xla_count_partial(delta_flat, mc, streams_d[:T//64]))
print("correctness partial:", truth, got, "MATCH" if truth == got else "MISMATCH")

def bench(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

t = bench(xla_count_partial, delta_flat, mc, streams_d)
print(f"A xla_scan 64MB: {t*1e3:.2f} ms  {total_bytes/t/1e9:.3f} GB/s")

# B variants: 2D gathers in pallas
def make_pallas(kernel, out_shape):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

# B1: table [1, N*256], jnp.take_along_axis along axis=1 with idx [1, S]
def kernel_b1(delta_ref, mc_ref, streams_ref, out_ref):
    table = delta_ref[:]          # [1, N*256]
    mct = mc_ref[:]               # [1, N_STATES]
    def body(t, carry):
        states, counts = carry    # [1, S]
        byte_row = streams_ref[t, :].astype(jnp.int32)[None, :]
        idx = states * 256 + byte_row
        states = jnp.take_along_axis(table, idx, axis=1)
        counts = counts + jnp.take_along_axis(mct, states, axis=1)
        return states, counts
    z = jnp.zeros((1, S), jnp.int32)
    _, counts = jax.lax.fori_loop(0, T//64, body, (z, z))
    out_ref[:] = counts

@jax.jit
def pallas_b1(delta_flat2, mc2, streams):
    return make_pallas(kernel_b1, jax.ShapeDtypeStruct((1, S), jnp.int32))(delta_flat2, mc2, streams)

try:
    d2 = delta_flat[None, :]
    mc2 = mc[None, :]
    r = pallas_b1(d2, mc2, streams_d[:T//64])
    print("B1 result:", int(np.asarray(r).sum()), "(truth", truth, ")")
    t = bench(pallas_b1, d2, mc2, streams_d[:T//64])
    print(f"B1 pallas take_along_axis: {t*1e3:.2f} ms  {total_bytes/64/t/1e9:.3f} GB/s")
except Exception as e:
    print("B1 FAILED:", repr(e)[:300])
