"""R-dimension scaling: amortize per-step fixed cost over more streams.

Same total bytes per launch; R (stream sublane rows) varies; T shrinks
accordingly.  Also probes a minimal kernel (table gather only, no
classmap/mask/count) to find the per-step latency floor.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1
TOTAL = 8 << 30  # 8 GiB scanned per launch (via reps)
DATA_MB = 128

rng = np.random.default_rng(0)
packed_cm = (
    rng.integers(0, 5, size=128, dtype=np.int32)
    | (rng.integers(0, 5, size=128, dtype=np.int32) << 8)
).reshape(1, 128)
table = (
    rng.integers(0, 100, size=(1, 128), dtype=np.int32)
    | (rng.integers(0, 2, size=(1, 128), dtype=np.int32) << _STATE_BITS)
)


def bcast(row, R):
    return jax.lax.broadcast_in_dim(row, (R, 128), (1,))


def build(R, T_TILE, unroll, minimal):
    S = R * 128
    T = (DATA_MB << 20) // S
    T -= T % T_TILE
    n_tiles = T // T_TILE
    reps = max(1, TOTAL // (T * S))
    n_grid = n_tiles * reps

    def kernel(cm_ref, tab_ref, st_ref, out_ref, state_scr, count_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cmp_ = bcast(cm_ref[:][0], R)
        tab0 = bcast(tab_ref[:][0], R)

        def step(t, sbase, counts):
            b = st_ref[t].astype(jnp.int32)
            if minimal:
                v = jnp.take_along_axis(tab0, (sbase + b) & 127, axis=1)
                return v & _STATE_MASK, counts
            blo = b & 127
            both = jnp.take_along_axis(cmp_, blo, axis=1)
            cls = jnp.where(b < 128, both & 0xFF, both >> 8)
            v = jnp.take_along_axis(tab0, sbase + cls, axis=1)
            return v & _STATE_MASK, counts + (v >> _STATE_BITS)

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

    @jax.jit
    def run(cm, tab, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128),
                    lambda i: (i % n_tiles, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(cm, tab, st)

    return run, T, S, reps


def main():
    cm_d = jax.device_put(packed_cm)
    tab_d = jax.device_put(table)
    import sys
    specs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
        (256, 64, 4, 0), (256, 128, 8, 0), (512, 64, 8, 0), (512, 32, 8, 0),
        (256, 64, 8, 1), (512, 32, 8, 1),
    ]
    for R, T_TILE, unroll, minimal in specs:
        try:
            fn, T, S, reps = build(R, T_TILE, unroll, minimal)
            st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
            st_d = jax.device_put(st)
            jax.block_until_ready(st_d)
            best, c = 1e9, None
            for i in range(4):
                t0 = time.perf_counter()
                out = int(np.asarray(fn(cm_d, tab_d, st_d), dtype=np.int64).sum())
                dt = time.perf_counter() - t0
                if i == 0:
                    c = out
                else:
                    assert out == c
                    best = min(best, dt)
            total = T * S * reps
            tag = "min" if minimal else "ful"
            print(
                f"{tag} R={R:4d} TT={T_TILE:4d} u={unroll:3d}: {best*1e3:7.1f}ms "
                f"{total/best/1e9:6.1f} GB/s  ({best/(T*reps)*1e9:6.1f} ns/step)",
                flush=True,
            )
            del st_d, st
        except Exception as e:
            print(f"R={R} TT={T_TILE} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
