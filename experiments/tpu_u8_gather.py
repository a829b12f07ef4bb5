"""Does 8-bit / 16-bit take_along_axis lower & run fast in Mosaic?

  g1_i32   baseline: gather on (R,128) i32 lanes          (8 vregs @ R=64)
  g1_u8    same chain but table+state held as u8 (32,128)-tiled (2 vregs)
  g1_i16   i16 variant (4 vregs)
  full_u8  realistic: u8 classmap gather + u8 next-state gather +
           u8 count gather, i32 count accumulate every step
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
REPS = 64
UNROLL = 8

rng = np.random.default_rng(0)
table_np = rng.integers(0, 100, size=128, dtype=np.int32)
cm_np = rng.integers(0, 5, size=256, dtype=np.int32)
count_np = rng.integers(0, 2, size=128, dtype=np.int32)


def build(mode):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS

    def kernel(tab_ref, cm_ref, cnt_ref, st_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        if mode == "g1_i32":
            tab = jax.lax.broadcast_in_dim(tab_ref[:][0].astype(jnp.int32), (R, 128), (1,))

            def step(t, s, c):
                b = st_ref[t].astype(jnp.int32)
                s = jnp.take_along_axis(tab, (s + b) & 127, axis=1)
                return s, c
        elif mode == "g1_u8":
            tab = jax.lax.broadcast_in_dim(tab_ref[:][0], (R, 128), (1,))  # u8

            def step(t, s, c):
                b = st_ref[t]  # u8
                idx = (s + b) & 127
                s = jnp.take_along_axis(tab, idx, axis=1)
                return s, c
        elif mode == "g1_i16":
            tab = jax.lax.broadcast_in_dim(tab_ref[:][0].astype(jnp.int16), (R, 128), (1,))

            def step(t, s, c):
                b = st_ref[t].astype(jnp.int16)
                s = jnp.take_along_axis(tab, (s + b) & 127, axis=1)
                return s, c
        elif mode == "full_u8":
            tab = jax.lax.broadcast_in_dim(tab_ref[:][0], (R, 128), (1,))  # u8 next
            cm0 = jax.lax.broadcast_in_dim(cm_ref[:][0], (R, 128), (1,))
            cm1 = jax.lax.broadcast_in_dim(cm_ref[:][1], (R, 128), (1,))
            cnt = jax.lax.broadcast_in_dim(cnt_ref[:][0], (R, 128), (1,))  # u8 counts

            def step(t, s, c):
                b = st_ref[t]  # u8
                blo = b & 127
                cls = jnp.where(b < 128, jnp.take_along_axis(cm0, blo, axis=1),
                                jnp.take_along_axis(cm1, blo, axis=1))
                idx = (s + cls) & 127
                s = jnp.take_along_axis(tab, idx, axis=1)
                c = c + jnp.take_along_axis(cnt, idx, axis=1).astype(jnp.int32)
                return s, c
        else:
            raise ValueError(mode)

        u8_state = mode in ("g1_u8", "full_u8")
        s0 = s_scr[:].astype(jnp.uint8) if u8_state else (
            s_scr[:].astype(jnp.int16) if mode == "g1_i16" else s_scr[:]
        )

        def inner(u, carry):
            s, c = carry
            for j in range(UNROLL):
                s, c = step(u * UNROLL + j, s, c)
            return s, c

        s, c = jax.lax.fori_loop(0, T_TILE // UNROLL, inner, (s0, c_scr[:]))
        s_scr[:] = s.astype(jnp.int32)
        c_scr[:] = c

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = s_scr[:] + c_scr[:]

    @jax.jit
    def run(tab, cm, cnt, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(tab, cm, cnt, st)

    return run


def main(modes):
    tab_u8 = jax.device_put(table_np.reshape(1, 128).astype(np.uint8))
    cm_u8 = jax.device_put(cm_np.reshape(2, 128).astype(np.uint8))
    cnt_u8 = jax.device_put(count_np.reshape(1, 128).astype(np.uint8))
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st)
    jax.block_until_ready(st_d)
    total = T * R * 128 * REPS
    for mode in modes:
        try:
            fn = build(mode)
            t0 = time.perf_counter()
            out = int(np.asarray(fn(tab_u8, cm_u8, cnt_u8, st_d), dtype=np.int64).sum())
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(tab_u8, cm_u8, cnt_u8, st_d), dtype=np.int64).sum())
                assert o == out
                best = min(best, time.perf_counter() - t1)
            ns = best / (T * REPS) * 1e9
            print(
                f"{mode:8s}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({ns:6.1f} ns/step = {ns*0.94:5.0f} cyc)  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{mode} FAILED: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["g1_i32", "g1_u8", "g1_i16", "full_u8"])
