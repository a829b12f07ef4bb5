"""Sustained-throughput measurement at 1GB scale with verified results."""
import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)

def bench(fn, *args, n=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

N_STATES = 64
delta = rng.integers(0, N_STATES, size=(N_STATES, 256), dtype=np.int32)
match_count = (rng.random(N_STATES) < 0.05).astype(np.int32)
delta_flat = jnp.asarray(delta.reshape(-1))
mc = jnp.asarray(match_count)

S, T = 8192, 131072   # 1 GiB
streams = jnp.asarray(rng.integers(0, 256, size=(T, S), dtype=np.uint8))
total = S * T

def make_unrolled(B):
    @jax.jit
    def f(delta_flat, mc, streams):
        sr = streams.reshape(T//B, B, S)
        def step(carry, byte_tile):
            states, counts = carry
            for b in range(B):
                states = jnp.take(delta_flat, states * 256 + byte_tile[b].astype(jnp.int32))
                counts = counts + jnp.take(mc, states)
            return (states, counts), None
        (s, c), _ = jax.lax.scan(step, (jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32)), sr)
        return c.sum()
    return f

for B in (32, 256):
    f = make_unrolled(B)
    r = int(f(delta_flat, mc, streams))
    t = bench(f, delta_flat, mc, streams)
    print(f"scan 1GiB unroll B={B}: result={r}  {t*1e3:.1f} ms  {total/t/1e9:.2f} GB/s", flush=True)

# Parallel gather at 1G indices scale
M = 1 << 28  # 256M indices (1GiB of int32)
idx = jnp.asarray(rng.integers(0, N_STATES*256, size=M, dtype=np.int32))
@jax.jit
def g(tab, i): return jnp.take(tab, i).sum()
r = int(g(delta_flat, idx))
t = bench(g, delta_flat, idx)
print(f"parallel gather 256M from 64KB table: {t*1e3:.1f} ms  {M/t/1e9:.2f} G-gathers/s", flush=True)

big_tab = jnp.asarray(rng.integers(0, 1000, size=11_000_000, dtype=np.int32))
idxb = jnp.asarray(rng.integers(0, 11_000_000, size=M, dtype=np.int32))
r = int(g(big_tab, idxb))
t = bench(g, big_tab, idxb)
print(f"parallel gather 256M from 44MB table: {t*1e3:.1f} ms  {M/t/1e9:.2f} G-gathers/s", flush=True)
