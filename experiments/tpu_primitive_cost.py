"""Ground-truth per-op cost inside a streaming Pallas kernel.

Uses the reps-grid harness (amortizes relay overhead).  Each variant
streams the same [T_TILE, R, 128] u8 tiles and per time step does:

  alu1   s = (s*5 + b) & 127                      (pure ALU chain)
  alu8   8 dependent ALU ops per step
  g1     s = tab[s & 127]  via take_along_axis    (1 gather)
  g2     two dependent gathers per step
  g1x2   two INDEPENDENT gather chains (ILP test)
  load   just b summed (streaming floor)
"""
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
table = rng.integers(0, 128, size=(1, 128), dtype=np.int32)


def bcast(row):
    return jax.lax.broadcast_in_dim(row, (R, 128), (1,))


def build(mode):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS

    def kernel(tab_ref, st_ref, out_ref, s_scr, s2_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)
            s2_scr[:] = jnp.ones((R, 128), jnp.int32)

        tab0 = bcast(tab_ref[:][0])

        def step(t, s, s2):
            b = st_ref[t].astype(jnp.int32)
            if mode == "load":
                s = s + b
            elif mode == "alu1":
                s = (s * 5 + b) & 127
            elif mode == "alu8":
                for _ in range(8):
                    s = (s * 5 + b) & 127
            elif mode == "g1":
                s = jnp.take_along_axis(tab0, (s + b) & 127, axis=1)
            elif mode == "g2":
                s = jnp.take_along_axis(tab0, (s + b) & 127, axis=1)
                s = jnp.take_along_axis(tab0, (s + b) & 127, axis=1)
            elif mode == "g1x2":
                s = jnp.take_along_axis(tab0, (s + b) & 127, axis=1)
                s2 = jnp.take_along_axis(tab0, (s2 + b) & 127, axis=1)
            return s, s2

        def inner(u, carry):
            s, s2 = carry
            for j in range(UNROLL):
                s, s2 = step(u * UNROLL + j, s, s2)
            return s, s2

        s, s2 = jax.lax.fori_loop(0, T_TILE // UNROLL, inner, (s_scr[:], s2_scr[:]))
        s_scr[:] = s
        s2_scr[:] = s2

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = s_scr[:] + s2_scr[:]

    @jax.jit
    def run(tab, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
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
        )(tab, st)

    return run


def main(modes=("load", "alu1", "alu8", "g1", "g2", "g1x2")):
    tab_d = jax.device_put(table)
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st)
    jax.block_until_ready(st_d)
    total = T * R * 128 * REPS
    for mode in modes:
        try:
            fn = build(mode)
            best, c = 1e9, None
            for i in range(4):
                t0 = time.perf_counter()
                out = int(np.asarray(fn(tab_d, st_d), dtype=np.int64).sum())
                dt = time.perf_counter() - t0
                if i == 0:
                    c = out
                else:
                    assert out == c
                    best = min(best, dt)
            ns = best / (T * REPS) * 1e9
            print(
                f"{mode:5s}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({ns:6.1f} ns/step = {ns*0.94:5.0f} cyc)",
                flush=True,
            )
        except Exception as e:
            print(f"{mode} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    import sys

    main(tuple(sys.argv[1:]) or ("load", "alu1", "alu8", "g1", "g2", "g1x2"))
