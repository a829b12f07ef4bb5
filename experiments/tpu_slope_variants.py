"""Slope-based throughput comparison of count-kernel variants.

Methodology: the axon relay adds ~30 ms fixed per-call overhead (and
block_until_ready does not block, so every call must materialize its
result).  Throughput = marginal rate between a half-size and full-size
scan: (N2-N1)/(t2-t1), min-of-5 each.

Variants:
  A  current production kernel: streams widened to int32 by XLA outside
     the pallas_call ([T,R,128] i32 in HBM = 4 B/byte + widening pass)
  B  uint8 streams end-to-end: [T,R,128] u8 BlockSpec, astype in-kernel
  C  B + validity masking only on boundary tiles (interior tiles skip
     the warm/vend compare chain)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64  # S = 8192 streams
T_TILE = 128
UNROLL = 4
ROWS = 1  # small automaton: n_states*k <= 128
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1

rng = np.random.default_rng(0)
classmap = rng.integers(0, 5, size=256, dtype=np.int32).reshape(2, 128)
# table: random transitions within one row, small counts in high bits
table = (
    rng.integers(0, 100, size=(ROWS, 128), dtype=np.int32)
    | (rng.integers(0, 2, size=(ROWS, 128), dtype=np.int32) << _STATE_BITS)
)


def bcast(row, R):
    return jax.lax.broadcast_in_dim(row, (R, 128), (1,))


def make_kernel(n_tiles, u8, boundary_only):
    def kernel(cm_ref, tab_ref, warm_ref, vend_ref, st_ref, out_ref, state_scr, count_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls0 = bcast(cm_ref[:][0], R)
        cls1 = bcast(cm_ref[:][1], R)
        tab0 = bcast(tab_ref[:][0], R)
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tile * T_TILE

        def step(t, sbase, counts, masked):
            raw = st_ref[t]
            b = raw.astype(jnp.int32) if u8 else raw
            blo = b & 127
            c0 = jnp.take_along_axis(cls0, blo, axis=1)
            c1 = jnp.take_along_axis(cls1, blo, axis=1)
            cls = jnp.where(b < 128, c0, c1)
            v = jnp.take_along_axis(tab0, sbase + cls, axis=1)
            sbase = v & _STATE_MASK
            cnt = v >> _STATE_BITS
            if masked:
                tg = t0 + t
                cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
            return sbase, counts + cnt

        def body(masked):
            def inner(u, carry):
                sbase, counts = carry
                for j in range(UNROLL):
                    sbase, counts = step(u * UNROLL + j, sbase, counts, masked)
                return sbase, counts
            return inner

        if boundary_only:
            is_boundary = (tile == 0) | (tile == n_tiles - 1)

            def run_masked():
                return jax.lax.fori_loop(0, T_TILE // UNROLL, body(True), (state_scr[:], count_scr[:]))

            def run_fast():
                return jax.lax.fori_loop(0, T_TILE // UNROLL, body(False), (state_scr[:], count_scr[:]))

            sbase, counts = jax.lax.cond(is_boundary, run_masked, run_fast)
        else:
            sbase, counts = jax.lax.fori_loop(
                0, T_TILE // UNROLL, body(True), (state_scr[:], count_scr[:])
            )
        state_scr[:] = sbase
        count_scr[:] = counts

        @pl.when(tile == n_tiles - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


def build_fn(T, u8, boundary_only, widen_outside):
    n_tiles = T // T_TILE
    kernel = make_kernel(n_tiles, u8=u8 and not widen_outside, boundary_only=boundary_only)
    st_dtype = jnp.uint8 if (u8 and not widen_outside) else jnp.int32

    @jax.jit
    def run(cm, tab, warm, vend, streams_u8):
        st = streams_u8 if (u8 and not widen_outside) else streams_u8.astype(jnp.int32)
        st = st.reshape(T, R, 128)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T_TILE, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(cm, tab, warm, vend, st)

    return run


def timed(fn, args):
    best = 1e9
    c = None
    for i in range(6):
        t0 = time.perf_counter()
        out = int(np.asarray(fn(*args), dtype=np.int64).sum())
        dt = time.perf_counter() - t0
        if i == 0:
            c = out
        else:
            assert out == c
            best = min(best, dt)
    return best, c


def main():
    T1, T2 = 8320, 16512
    cm_d = jax.device_put(classmap)
    tab_d = jax.device_put(table)
    warm = np.full((R, 128), 5, dtype=np.int32)
    warm[0, 0] = 0
    vend = np.full((R, 128), T2, dtype=np.int32)
    warm_d, vend_d = jax.device_put(warm), jax.device_put(vend)
    st2 = rng.integers(0, 256, size=(T2, R * 128), dtype=np.uint8)
    st2_d = jax.device_put(st2)
    st1_d = jax.device_put(st2[:T1].copy())
    jax.block_until_ready(st2_d)

    for name, u8, bonly, widen in (
        ("A int32-widened", False, False, True),
        ("B uint8-in-kernel", True, False, False),
        ("C B+boundary-mask", True, True, False),
    ):
        try:
            ts = {}
            for T, st_d in ((T1, st1_d), (T2, st2_d)):
                fn = build_fn(T, u8=u8, boundary_only=bonly, widen_outside=widen)
                best, c = timed(fn, (cm_d, tab_d, warm_d, vend_d, st_d))
                ts[T] = best
            slope = (T2 - T1) * R * 128 / (ts[T2] - ts[T1]) if ts[T2] > ts[T1] else float("nan")
            print(
                f"{name}: t1={ts[T1]*1e3:.1f}ms t2={ts[T2]*1e3:.1f}ms "
                f"slope={slope/1e9:.1f} GB/s",
                flush=True,
            )
        except Exception as e:
            print(f"{name} FAILED: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
