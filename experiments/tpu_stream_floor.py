"""Find the streaming floor: where do ~230 cycles/step go?

Variants (all just reduce the streamed tile into an accumulator):
  u8_step   per-step st_ref[t].astype(i32) adds      (the current pattern)
  i32_step  same but streams are pre-widened int32
  u8_tile   whole-tile jnp.sum(st_ref[:], axis=0)    (compiler free reign)
  i32_tile  same on int32
  u8_row8   read 8 time-steps as one (8*R, 128) slab view -> sum
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
T_TILE = 128
T = 16512
REPS = 8

rng = np.random.default_rng(0)


def build(mode):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS
    u8 = mode.startswith("u8")

    def kernel(st_ref, out_ref, s_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)

        if mode.endswith("_tile"):
            s_scr[:] = s_scr[:] + jnp.sum(st_ref[:].astype(jnp.int32), axis=0)
        elif mode == "u8_row8":
            s = s_scr[:]
            flat = st_ref[:].reshape(T_TILE // 8, 8 * R, 128)
            for t in range(T_TILE // 8):
                slab = flat[t].astype(jnp.int32)
                s = s + jnp.sum(slab.reshape(8, R, 128), axis=0)
            s_scr[:] = s
        else:
            def body(u, s):
                for j in range(8):
                    s = s + st_ref[u * 8 + j].astype(jnp.int32)
                return s

            s_scr[:] = jax.lax.fori_loop(0, T_TILE // 8, body, s_scr[:])

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = s_scr[:]

    @jax.jit
    def run(st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec(
                    (T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
        )(st)

    return run, u8


def main(modes):
    st_u8 = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_u8_d = jax.device_put(st_u8)
    st_i32_d = None
    jax.block_until_ready(st_u8_d)
    total = T * R * 128 * REPS
    for mode in modes:
        try:
            fn, u8 = build(mode)
            if u8:
                arg = st_u8_d
            else:
                if st_i32_d is None:
                    st_i32_d = jax.device_put(st_u8.astype(np.int32))
                    jax.block_until_ready(st_i32_d)
                arg = st_i32_d
            t0 = time.perf_counter()
            out = int(np.asarray(fn(arg), dtype=np.int64).sum())
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(arg), dtype=np.int64).sum())
                assert o == out
                best = min(best, time.perf_counter() - t1)
            ns = best / (T * REPS) * 1e9
            print(
                f"{mode:9s}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({ns:6.1f} ns/step = {ns*0.94:5.0f} cyc)  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{mode} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["u8_step", "i32_step", "u8_tile", "i32_tile", "u8_row8"])
