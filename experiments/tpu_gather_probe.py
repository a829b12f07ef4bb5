"""Probe: which gather formulations compile on TPU Pallas, and how fast.

Compares, on the real chip:
  A. XLA lax.scan DFA count (the existing engine)
  B. Pallas kernel: fori_loop over time, jnp.take gather from VMEM table
  C. memcpy-style roof: read streams, sum them (no gather)
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1024          # streams (lanes x sublanes)
T = 16384         # bytes per stream -> total 16 MiB
N_STATES = 64

rng = np.random.default_rng(0)
delta = rng.integers(0, N_STATES, size=(N_STATES, 256), dtype=np.int32)
match_count = (rng.random(N_STATES) < 0.05).astype(np.int32)
streams = rng.integers(0, 256, size=(T, S), dtype=np.uint8)

delta_flat = jnp.asarray(delta.reshape(-1))
mc = jnp.asarray(match_count)
streams_d = jnp.asarray(streams)

total_bytes = T * S

def bench(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

# --- A: XLA scan ---
@jax.jit
def xla_count(delta_flat, mc, streams):
    def step(carry, byte_row):
        states, counts = carry
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        counts = counts + jnp.take(mc, states)
        return (states, counts), None
    (s, c), _ = jax.lax.scan(step, (jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32)), streams)
    return c.sum()

try:
    t = bench(xla_count, delta_flat, mc, streams_d)
    print(f"A xla_scan: {t*1e3:.2f} ms  {total_bytes/t/1e9:.3f} GB/s")
except Exception as e:
    print("A xla_scan FAILED:", repr(e)[:300])

# --- B: pallas gather ---
def kernel_b(delta_ref, mc_ref, streams_ref, out_ref):
    def body(t, carry):
        states, counts = carry
        byte_row = streams_ref[t, :].astype(jnp.int32)
        idx = states * 256 + byte_row
        states = jnp.take(delta_ref[:], idx)
        counts = counts + jnp.take(mc_ref[:], states)
        return states, counts
    states0 = jnp.zeros((S,), jnp.int32)
    counts0 = jnp.zeros((S,), jnp.int32)
    _, counts = jax.lax.fori_loop(0, T, body, (states0, counts0))
    out_ref[:] = counts

@jax.jit
def pallas_count(delta_flat, mc, streams):
    return pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((S,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(delta_flat, mc, streams)

try:
    t = bench(pallas_count, delta_flat, mc, streams_d)
    print(f"B pallas_gather: {t*1e3:.2f} ms  {total_bytes/t/1e9:.3f} GB/s")
except Exception as e:
    print("B pallas_gather FAILED:", repr(e)[:500])

# --- C: roof (sum bytes) ---
def kernel_c(streams_ref, out_ref):
    out_ref[:] = jnp.sum(streams_ref[:].astype(jnp.int32), axis=0)

@jax.jit
def roof(streams):
    return pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct((S,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(streams)

try:
    t = bench(roof, streams_d)
    print(f"C roof_sum: {t*1e3:.2f} ms  {total_bytes/t/1e9:.3f} GB/s")
except Exception as e:
    print("C roof FAILED:", repr(e)[:300])
