"""HBM bandwidth roofs outside/inside Pallas.

  xcopy   jit(x -> x + 1) on 512 MiB u8         (XLA read+write roof)
  xsum    jit(x -> sum(x)) on 512 MiB u8        (XLA read roof)
  xsum32  same on int32 view                    (rule out u8 penalty)
  pnop    one-pass monotonic Pallas nop kernel  (pipeline DMA roof)
  pnop2   same but index_map i -> i (explicit identity)
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 512
N = MB << 20
R = 64
T = N // (R * 128)  # 65536

rng = np.random.default_rng(0)


def timed(fn, arg, n=3):
    out = np.asarray(fn(arg))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(arg)
        # touch one element: forces completion without full fetch
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main(which):
    st = rng.integers(0, 256, size=(T, R, 128), dtype=np.uint8)
    st_d = jax.device_put(st)
    jax.block_until_ready(st_d)

    if "xcopy" in which:
        f = jax.jit(lambda x: x + 1)
        t = timed(f, st_d)
        print(f"xcopy : {t*1e3:7.1f}ms  {N/t/1e9:6.1f} GB/s (rw: {2*N/t/1e9:.0f})", flush=True)
    if "xsum" in which:
        f = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
        t = timed(f, st_d)
        print(f"xsum  : {t*1e3:7.1f}ms  {N/t/1e9:6.1f} GB/s", flush=True)
    if "xsum32" in which:
        i32 = jax.device_put(st[: T // 4].astype(np.int32))
        jax.block_until_ready(i32)
        f = jax.jit(lambda x: jnp.sum(x))
        t = timed(f, i32)
        print(f"xsum32: {t*1e3:7.1f}ms  {N/t/1e9:6.1f} GB/s (of i32 bytes)", flush=True)

    for name, tt in (("pnop", 256), ("pnop_big", 1024)):
        if name not in which:
            continue
        n_tiles = T // tt

        def kernel(st_ref, out_ref):
            pass

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((tt, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            )(x)

        t = timed(run, st_d)
        print(
            f"{name} tt={tt}: {t*1e3:7.1f}ms  {N/t/1e9:6.1f} GB/s  ({t/n_tiles*1e6:.1f} us/tile of {tt*R*128>>10} KiB)",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["xcopy", "xsum", "xsum32", "pnop", "pnop_big"])
