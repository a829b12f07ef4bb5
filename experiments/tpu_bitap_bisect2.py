"""Bisect round 2: is the 639-vs-220 GB/s gap caused by the staged stream
array itself (jit-output [T,S] reshaped per call) vs a directly-uploaded
[T, R, 128] array?

Variants (all prod-style kernel, nocond/nowarm — measured equal to prod):
  staged     st.streams_dev (jit windowing output), reshape inside run
  roundtrip  np.asarray(st.streams_dev) -> host reshape [T,R,128] -> device_put
  copy3d     on-device: jit(lambda x: x.reshape(T,R,128) + 0) materialized
"""
import os, sys, time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops import bitap_scan

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = int(os.environ.get("PROBE_MB", "128"))
R, T_TILE, UNROLL = 256, 128, 8


def make_kernel(n_tiles, reps, lay):
    n_grid = n_tiles * reps
    seed_i, endmask_i = int(lay.seed), int(lay.endmask)
    fields = lay.fields

    def kernel(btab_ref, streams_ref, out_ref, d_scr, cnt_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _i1():
            d_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _i2():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)

        brow = jax.lax.broadcast_in_dim(btab_ref[0], (R, 128), (1,))

        def body(u, carry):
            D, counts = carry
            blk = None
            for j in range(UNROLL):
                t = u * UNROLL + j
                byte = streams_ref[t].astype(jnp.int32)
                B = jnp.take_along_axis(brow, jnp.minimum(byte, 127), axis=1)
                D = ((D << 1) | jnp.int32(seed_i)) & B
                e = D & jnp.int32(endmask_i)
                blk = e if blk is None else blk + e
            for eb, h, w in fields:
                counts = counts + ((blk >> eb) & jnp.int32((1 << h) - 1))
            return D, counts

        D, counts = jax.lax.fori_loop(
            0, T_TILE // UNROLL, body, (d_scr[:], cnt_scr[:])
        )
        d_scr[:] = D
        cnt_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _f():
            out_ref[:] = cnt_scr[:]

    return kernel


def build(T, reps, lay, pre_shaped):
    n_tiles = T // T_TILE
    kernel = make_kernel(n_tiles, reps, lay)

    @jax.jit
    def run(btab, streams):
        if not pre_shaped:
            streams = streams.reshape(T, R, 128)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles * reps,),
            in_specs=[
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(btab, streams)

    return run


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    lay = bitap_scan.plan_bitap(machine)
    eng = bitap_scan.BitapAcEngine(machine)
    st = eng.stage(data)
    T = st.plan.time_len
    n_scan = T * R * 128
    print(f"T={T}", flush=True)

    arrays = {
        "staged": (st.streams_dev, False),
        "copy3d": (
            jax.jit(lambda x: x.reshape(T, R, 128) + jnp.uint8(0))(st.streams_dev),
            True,
        ),
    }
    if os.environ.get("AMT_RT"):  # 134 MB host fetch — slow tunnel, opt-in
        host = np.asarray(st.streams_dev)
        arrays["roundtrip"] = (jax.device_put(host.reshape(T, R, 128)), True)
    for name, (arr, pre) in arrays.items():
        fns = {r: build(T, r, lay, pre) for r in (2, 602)}

        def go(r):
            return np.asarray(fns[r](eng._btab_dev, arr))

        base = go(2)
        go(602)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter(); go(2); t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); go(602); t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / 600)
        print(f"{name}: {n_scan/best/1e9:.1f} GB/s (slope {best*1e3:.3f} ms) "
              f"sum={int(base.astype(np.int64).sum())}", flush=True)


if __name__ == "__main__":
    main()
