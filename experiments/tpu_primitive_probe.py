"""Measure TPU primitive costs for DFA-kernel design:
  P2a: XLA parallel gather from small (VMEM-able) table
  P2b: XLA parallel gather from big (HBM) table
  P3a: pallas take_along_axis lanes ([R,128] table rows of 128)
  P3b: pallas take_along_axis sublanes (variant 1, height 8 / 64)
  P4:  XLA scan with inner unroll (fewer, fatter steps)
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def bench(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

M = 1 << 24  # 16M indices

# P2a: parallel gather, small table
small_tab = jnp.asarray(rng.integers(0, 1000, size=16384, dtype=np.int32))
idx_small = jnp.asarray(rng.integers(0, 16384, size=M, dtype=np.int32))
@jax.jit
def g_small(t, i): return jnp.take(t, i).sum()
t = bench(g_small, small_tab, idx_small)
print(f"P2a xla gather 16K-table: {M/t/1e9:.2f} G-gathers/s")

# P2b: parallel gather, big table (44MB like 10k needles)
big_tab = jnp.asarray(rng.integers(0, 1000, size=11_000_000, dtype=np.int32))
idx_big = jnp.asarray(rng.integers(0, 11_000_000, size=M, dtype=np.int32))
t = bench(g_small, big_tab, idx_big)
print(f"P2b xla gather 44MB-table: {M/t/1e9:.2f} G-gathers/s")

# P3a: pallas lane-gather loop: states' = table128[state'] chained (latency) and parallel (throughput)
R, L, ITERS = 64, 128, 4096
tab128 = jnp.asarray(rng.integers(0, 128, size=(1, 128), dtype=np.int32))
st0 = jnp.asarray(rng.integers(0, 128, size=(R, 128), dtype=np.int32))

def k_lane_chain(tab_ref, st_ref, out_ref):
    tab = jnp.broadcast_to(tab_ref[:], (R, 128))
    def body(t, st):
        return jnp.take_along_axis(tab, st, axis=1)
    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, st_ref[:])

@jax.jit
def lane_chain(tab, st):
    return pl.pallas_call(
        k_lane_chain,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, st)

try:
    t = bench(lane_chain, tab128, st0)
    per = t / ITERS
    print(f"P3a pallas lane-gather chain: {per*1e9:.1f} ns/step for {R}x128 -> {R*128/per/1e9:.1f} G-elt/s")
except Exception as e:
    print("P3a FAILED:", repr(e)[:200])

# P3b: sublane gather variant-1 with height 8 then 64
for H in (8, 64):
    tabH = jnp.asarray(rng.integers(0, 100, size=(H, 128), dtype=np.int32))
    idxH = jnp.asarray(rng.integers(0, H, size=(H, 128), dtype=np.int32))
    def k_sub(tab_ref, idx_ref, out_ref):
        def body(t, acc):
            g = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((H,128), jnp.int32))
    @jax.jit
    def sub_g(tab, idx):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((H, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    try:
        t = bench(sub_g, tabH, idxH)
        print(f"P3b sublane-gather H={H}: {t/ITERS*1e9:.1f} ns/step -> {H*128/(t/ITERS)/1e9:.1f} G-elt/s")
    except Exception as e:
        print(f"P3b H={H} FAILED:", repr(e)[:200])

# P4: XLA scan with inner unroll
S, T = 1024, 65536
N_STATES = 64
delta_flat = jnp.asarray(rng.integers(0, N_STATES*256, size=N_STATES*256, dtype=np.int32) % (N_STATES*256))
delta_flat = delta_flat // 256  # valid states
mc = jnp.asarray((rng.random(N_STATES) < 0.05).astype(np.int32))
streams = jnp.asarray(rng.integers(0, 256, size=(T, S), dtype=np.uint8))

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

for B in (16, 128):
    try:
        f = make_unrolled(B)
        t = bench(f, delta_flat, mc, streams)
        print(f"P4 xla scan unroll B={B}: {t*1e3:.1f} ms  {T*S/t/1e9:.3f} GB/s")
    except Exception as e:
        print(f"P4 B={B} FAILED:", repr(e)[:200])
