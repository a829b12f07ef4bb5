"""One-gather-per-byte kernel: byte->class mapping done at stream staging.

The engine stages streams host-side anyway (build_streams); applying the
256-entry classmap there (vectorized numpy) leaves the device kernel a
single packed-table gather per byte.

  full2g    in-kernel packed classmap + table gather + mask   (engine today)
  hcls1g    class streams: 1 gather + count + mask
  hcls1g_nm hcls1g without the warm/vend mask
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
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1

rng = np.random.default_rng(0)
K = 5
classmap_np = rng.integers(0, K, size=256, dtype=np.uint8)
packed_cm = (classmap_np[:128].astype(np.int32) | (classmap_np[128:].astype(np.int32) << 8)).reshape(1, 128)
table_np = (
    rng.integers(0, 25, size=128, dtype=np.int32) * K % 128
    | (rng.integers(0, 2, size=128, dtype=np.int32) << _STATE_BITS)
).reshape(1, 128)


def build(mode):
    n_tiles = T // T_TILE
    n_grid = n_tiles * REPS

    def kernel(cm_ref, tab_ref, warm_ref, vend_ref, st_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cmp_ = jax.lax.broadcast_in_dim(cm_ref[:][0], (R, 128), (1,))
        tab = jax.lax.broadcast_in_dim(tab_ref[:][0], (R, 128), (1,))
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = (tile % n_tiles) * T_TILE

        def step(t, s, c):
            b = st_ref[t].astype(jnp.int32)
            if mode == "full2g":
                blo = b & 127
                both = jnp.take_along_axis(cmp_, blo, axis=1)
                cls = jnp.where(b < 128, both & 0xFF, both >> 8)
            else:
                cls = b
            v = jnp.take_along_axis(tab, (s + cls) & 127, axis=1)
            s = v & _STATE_MASK
            cnt = v >> _STATE_BITS
            if mode != "hcls1g_nm":
                tg = t0 + t
                cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
            return s, c + cnt

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
    def run(cm, tab, warm, vend, st):
        return pl.pallas_call(
            kernel,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        )(cm, tab, warm, vend, st)

    return run


def main(modes):
    cm_d = jax.device_put(packed_cm)
    tab_d = jax.device_put(table_np)
    warm = np.full((R, 128), 5, dtype=np.int32)
    warm[0, 0] = 0
    vend = np.full((R, 128), T, dtype=np.int32)
    warm_d, vend_d = jax.device_put(warm), jax.device_put(vend)
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    t0 = time.perf_counter()
    st_cls = classmap_np[st]  # host classmap application
    host_s = time.perf_counter() - t0
    print(f"host classmap of {T*R*128>>20} MiB: {host_s:.3f}s = {T*R*128/host_s/1e9:.2f} GB/s", flush=True)
    st_d = jax.device_put(st)
    st_cls_d = jax.device_put(st_cls)
    jax.block_until_ready(st_cls_d)
    total = T * R * 128 * REPS
    for mode in modes:
        try:
            arg = st_d if mode == "full2g" else st_cls_d
            fn = build(mode)
            t0 = time.perf_counter()
            out = int(np.asarray(fn(cm_d, tab_d, warm_d, vend_d, arg), dtype=np.int64).sum())
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(cm_d, tab_d, warm_d, vend_d, arg), dtype=np.int64).sum())
                assert o == out
                best = min(best, time.perf_counter() - t1)
            ns = best / (T * REPS) * 1e9
            print(
                f"{mode:10s}: {best*1e3:7.1f}ms  {total/best/1e9:6.1f} GB/s  "
                f"({ns:6.1f} ns/step = {ns*0.94:5.0f} cyc)  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{mode} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full2g", "hcls1g", "hcls1g_nm"])
