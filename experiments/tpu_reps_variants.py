"""Steady-state kernel throughput via a repetition grid.

grid=(REPS*n_tiles,) with index_map i -> i % n_tiles re-scans the same
device-resident streams REPS times in ONE kernel launch, amortizing the
~30 ms relay overhead to nothing.  Counts come out REPS*base (verified).

Sweeps the count-kernel variants:
  A  int32 streams (pre-widened in HBM, 4 B/byte)
  B  uint8 streams, astype per step in-kernel
  C  B without any validity masking (upper bound for mask cost)
  D  B with classmap packed into one row (lo|hi<<8), one gather saved
  E  D + unroll variants
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64  # S = 8192 streams
T_TILE = 128
ROWS = 1
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1

T = 16512  # 128 MiB at S=8192
REPS = 64

rng = np.random.default_rng(0)
classmap = rng.integers(0, 5, size=256, dtype=np.int32).reshape(2, 128)
packed_cm = (classmap[0] | (classmap[1] << 8)).reshape(1, 128)
table = (
    rng.integers(0, 100, size=(ROWS, 128), dtype=np.int32)
    | (rng.integers(0, 2, size=(ROWS, 128), dtype=np.int32) << _STATE_BITS)
)


def bcast(row, R):
    return jax.lax.broadcast_in_dim(row, (R, 128), (1,))


def make_kernel(n_grid, u8, mask, packed_classmap, unroll):
    def kernel(cm_ref, tab_ref, warm_ref, vend_ref, st_ref, out_ref, state_scr, count_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        if packed_classmap:
            cmp_ = bcast(cm_ref[:][0], R)
        else:
            cls0 = bcast(cm_ref[:][0], R)
            cls1 = bcast(cm_ref[:][1], R)
        tab0 = bcast(tab_ref[:][0], R)
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = (tile % (T // T_TILE)) * T_TILE

        def step(t, sbase, counts):
            raw = st_ref[t]
            b = raw.astype(jnp.int32) if u8 else raw
            blo = b & 127
            if packed_classmap:
                both = jnp.take_along_axis(cmp_, blo, axis=1)
                cls = jnp.where(b < 128, both & 0xFF, both >> 8)
            else:
                c0 = jnp.take_along_axis(cls0, blo, axis=1)
                c1 = jnp.take_along_axis(cls1, blo, axis=1)
                cls = jnp.where(b < 128, c0, c1)
            v = jnp.take_along_axis(tab0, sbase + cls, axis=1)
            sbase = v & _STATE_MASK
            cnt = v >> _STATE_BITS
            if mask:
                tg = t0 + t
                cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
            return sbase, counts + cnt

        def inner(u, carry):
            sbase, counts = carry
            for j in range(unroll):
                sbase, counts = step(u * unroll + j, sbase, counts)
            return sbase, counts

        sbase, counts = jax.lax.fori_loop(
            0, T_TILE // unroll, inner, (state_scr[:], count_scr[:])
        )
        state_scr[:] = sbase
        count_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


def build_fn(u8, mask, packed_classmap, unroll):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS
    kernel = make_kernel(n_grid, u8, mask, packed_classmap, unroll)
    cm_rows = 1 if packed_classmap else 2

    @jax.jit
    def run(cm, tab, warm, vend, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((cm_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128),
                    lambda i: (i % (T // T_TILE), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
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
    for i in range(4):
        t0 = time.perf_counter()
        out = int(np.asarray(fn(*args), dtype=np.int64).sum())
        dt = time.perf_counter() - t0
        if i == 0:
            c = out
        else:
            assert out == c, (out, c)
            best = min(best, dt)
    return best, c


def main():
    total = T * R * 128 * REPS
    cm_d = jax.device_put(classmap)
    cmp_d = jax.device_put(packed_cm)
    tab_d = jax.device_put(table)
    warm = np.full((R, 128), 5, dtype=np.int32)
    warm[0, 0] = 0
    vend = np.full((R, 128), T, dtype=np.int32)
    warm_d, vend_d = jax.device_put(warm), jax.device_put(vend)
    st_u8 = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_u8_d = jax.device_put(st_u8)
    st_i32_d = None
    jax.block_until_ready(st_u8_d)

    for name, u8, mask, pcm, unroll in (
        ("A int32+mask      u4", False, True, False, 4),
        ("B uint8+mask      u4", True, True, False, 4),
        ("C uint8 nomask    u4", True, False, False, 4),
        ("D uint8+mask pcm  u4", True, True, True, 4),
        ("E uint8+mask pcm  u8", True, True, True, 8),
        ("F uint8+mask pcm u16", True, True, True, 16),
        ("G uint8 nomask pcm u8", True, False, True, 8),
    ):
        try:
            fn = build_fn(u8, mask, pcm, unroll)
            if u8:
                st_arg = st_u8_d
            else:
                if st_i32_d is None:
                    st_i32_d = jax.device_put(st_u8.astype(np.int32))
                    jax.block_until_ready(st_i32_d)
                st_arg = st_i32_d
            cm_arg = cmp_d if pcm else cm_d
            best, c = timed(fn, (cm_arg, tab_d, warm_d, vend_d, st_arg))
            print(
                f"{name}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({best/(T*REPS)*1e9:5.1f} ns/step)",
                flush=True,
            )
        except Exception as e:
            print(f"{name} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
