"""Static-unrolled time loop: eliminate the dynamic st_ref[t] cost.

Like tpu_primitive_cost but the per-tile loop is a Python `for t in
range(T_TILE)` — every VMEM access at a compile-time offset.  T_TILE is
small (32) to bound compile time; the grid covers tiles * REPS.

Variants: sload (stream+add), sfull (real DFA step: packed classmap
gather + table gather + mask + count).
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
T_TILE = 32
T = 16512 - (16512 % T_TILE)  # 16512 divisible by 32
REPS = 64
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1

rng = np.random.default_rng(0)
packed_cm = (
    rng.integers(0, 5, size=128, dtype=np.int32)
    | (rng.integers(0, 5, size=128, dtype=np.int32) << 8)
).reshape(1, 128)
table = (
    rng.integers(0, 100, size=(1, 128), dtype=np.int32)
    | (rng.integers(0, 2, size=(1, 128), dtype=np.int32) << _STATE_BITS)
)


def bcast(row):
    return jax.lax.broadcast_in_dim(row, (R, 128), (1,))


def build(mode, t_tile=T_TILE):
    n_tiles = T // t_tile
    n_grid = n_tiles * REPS

    def kernel(cm_ref, tab_ref, st_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cmp_ = bcast(cm_ref[:][0])
        tab0 = bcast(tab_ref[:][0])
        s = s_scr[:]
        c = c_scr[:]
        for t in range(t_tile):  # STATIC
            b = st_ref[t].astype(jnp.int32)
            if mode == "sload":
                s = s + b
            elif mode == "sfull":
                blo = b & 127
                both = jnp.take_along_axis(cmp_, blo, axis=1)
                cls = jnp.where(b < 128, both & 0xFF, both >> 8)
                v = jnp.take_along_axis(tab0, (s + cls) & 127, axis=1)
                s = v & _STATE_MASK
                c = c + (v >> _STATE_BITS)
            elif mode == "sg1":
                v = jnp.take_along_axis(tab0, (s + b) & 127, axis=1)
                s = v & _STATE_MASK
        s_scr[:] = s
        c_scr[:] = c

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = s_scr[:] + c_scr[:]

    @jax.jit
    def run(cm, tab, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(cm, tab, st)

    return run


def main(modes):
    cm_d = jax.device_put(packed_cm)
    tab_d = jax.device_put(table)
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st)
    jax.block_until_ready(st_d)
    total = T * R * 128 * REPS
    for spec in modes:
        mode, _, tt = spec.partition(":")
        tt = int(tt) if tt else T_TILE
        try:
            t0 = time.perf_counter()
            fn = build(mode, tt)
            out = int(np.asarray(fn(cm_d, tab_d, st_d), dtype=np.int64).sum())
            compile_s = time.perf_counter() - t0
            best, c = 1e9, out
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(cm_d, tab_d, st_d), dtype=np.int64).sum())
                assert o == c
                best = min(best, time.perf_counter() - t1)
            ns = best / (T * REPS) * 1e9
            print(
                f"{mode} tt={tt}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({ns:6.1f} ns/step = {ns*0.94:5.0f} cyc)  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{spec} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["sload", "sfull"])
