"""Select-chain cost vs table rows at R=256.

rows=N means the packed table spans N 128-entry rows; each lookup is N
gathers + N-1 selects.  Establishes the practical automaton-size budget
of the VMEM kernel and the slope for the hot-DFA design.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 256
T_TILE = 128
T = 2048  # 64 MiB at S=32768
REPS = 16
UNROLL = int(__import__("os").environ.get("AM_UNROLL", "4"))
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1

rng = np.random.default_rng(0)


def build(rows):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS
    n_entries = rows * 128

    def kernel(cm_ref, tab_ref, st_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls0 = jax.lax.broadcast_in_dim(cm_ref[:][0], (R, 128), (1,))
        cls1 = jax.lax.broadcast_in_dim(cm_ref[:][1], (R, 128), (1,))
        tab_rows = [
            jax.lax.broadcast_in_dim(tab_ref[:][r], (R, 128), (1,)) for r in range(rows)
        ]

        import os as _os

        tree = bool(_os.environ.get("AM_TREE"))

        def lookup(idx):
            lo = idx & 127
            hi = idx >> 7
            if not tree:
                out = None
                for r, row in enumerate(tab_rows):
                    cand = jnp.take_along_axis(row, lo, axis=1)
                    out = cand if out is None else jnp.where(hi == r, cand, out)
                return out
            # Tree variant: masked terms reduced pairwise (log depth, ILP).
            terms = [
                jnp.where(hi == r, jnp.take_along_axis(row, lo, axis=1), 0)
                for r, row in enumerate(tab_rows)
            ]
            while len(terms) > 1:
                nxt = [terms[i] | terms[i + 1] for i in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            return terms[0]

        def step(t, s, c):
            b = st_ref[t].astype(jnp.int32)
            blo = b & 127
            cls = jnp.where(
                b < 128,
                jnp.take_along_axis(cls0, blo, axis=1),
                jnp.take_along_axis(cls1, blo, axis=1),
            )
            v = lookup(s + cls)
            s = v & _STATE_MASK
            c = c + (v >> _STATE_BITS)
            return s, c

        def inner(u, carry):
            s, c = carry
            for j in range(UNROLL):
                s, c = step(u * UNROLL + j, s, c)
            return s, c

        s, c = jax.lax.fori_loop(0, T_TILE // UNROLL, inner, (s_scr[:], c_scr[:]))
        s_scr[:] = s
        c_scr[:] = c

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = c_scr[:]

    @jax.jit
    def run(cm, tab, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        )(cm, tab, st)

    return run, n_entries


def main(rows_list):
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st)
    jax.block_until_ready(st_d)
    total = T * R * 128 * REPS
    cm = rng.integers(0, 20, size=(2, 128), dtype=np.int32)
    cm_d = jax.device_put(cm)
    for rows in rows_list:
        fn, n_entries = build(rows)
        # next-state premultiplied base must stay < n_entries
        tab = (
            rng.integers(0, max(1, n_entries - 20), size=(rows, 128), dtype=np.int32)
            | (rng.integers(0, 2, size=(rows, 128), dtype=np.int32) << _STATE_BITS)
        )
        tab_d = jax.device_put(tab)
        try:
            t0 = time.perf_counter()
            out = int(np.asarray(fn(cm_d, tab_d, st_d), dtype=np.int64).sum())
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(cm_d, tab_d, st_d), dtype=np.int64).sum())
                assert o == out
                best = min(best, time.perf_counter() - t1)
            print(
                f"rows={rows:3d} ({n_entries:5d} entries): {best*1e3:8.1f}ms  "
                f"{total/best/1e9:6.1f} GB/s  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"rows={rows} FAILED: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2, 8, 32])
