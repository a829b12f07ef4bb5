"""Pin down the ~35 GB/s wall: DMA bandwidth or grid overhead?

  nop:TT    kernel body does nothing (tile still streamed by pipeline)
  sum1:TT   s += first row only (forces tile resident, minimal compute)
  copy:TT   out tile = in tile (read+write)

TT = time-tile; grid = (T/TT)*REPS.  Throughput counted as input bytes.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
T = 16384
REPS = 64

rng = np.random.default_rng(0)


def build(mode, t_tile):
    n_tiles = T // t_tile
    n_grid = n_tiles * REPS

    if mode == "copy":
        def kernel(st_ref, out_ref):
            out_ref[:] = st_ref[:]

        out_spec = pl.BlockSpec(
            (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((T, R, 128), jnp.uint8)
        scratch = []
    else:
        def kernel(st_ref, out_ref, s_scr):
            tile = pl.program_id(0)

            @pl.when(tile == 0)
            def _init():
                s_scr[:] = jnp.zeros((R, 128), jnp.int32)

            if mode == "sum1":
                s_scr[:] = s_scr[:] + st_ref[0].astype(jnp.int32)

            @pl.when(tile == n_grid - 1)
            def _fin():
                out_ref[:] = s_scr[:]

        out_spec = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((R, 128), jnp.int32)
        scratch = [pltpu.VMEM((R, 128), jnp.int32)]

    @jax.jit
    def run(st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec(
                    (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(st)

    return run


def main(specs):
    st_u8 = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st_u8)
    jax.block_until_ready(st_d)
    total = T * R * 128 * REPS
    for spec in specs:
        mode, _, tt = spec.partition(":")
        tt = int(tt) if tt else 128
        try:
            fn = build(mode, tt)
            t0 = time.perf_counter()
            out = np.asarray(fn(st_d))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                np.asarray(fn(st_d))
                best = min(best, time.perf_counter() - t1)
            n_grid = (T // tt) * REPS
            print(
                f"{mode:5s} tt={tt:4d}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({best/n_grid*1e6:7.1f} us/tile)  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{spec} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["nop:128", "nop:512", "sum1:128", "sum1:512", "copy:128", "copy:512"])
