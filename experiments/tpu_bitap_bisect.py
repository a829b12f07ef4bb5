"""Bisect the production-bitap vs probe-bitap gap (218 vs 639 GB/s).

Variants on the SAME staged production streams (128 MiB, T=4224):
  prod      production kernel as-is (cond + warm + bscal)
  nocond    masked/unmasked cond removed (always unmasked; perf-only)
  nowarm    nocond + no warm_ref load
  row0      nowarm + only B row 0 broadcast
  probe     the original probe kernel verbatim on the same streams
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
from alfred_margaret_tpu.ops.pallas_scan import _broadcast_rows

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = int(os.environ.get("PROBE_MB", "128"))
R, T_TILE, UNROLL = 256, 128, 8


def make_kernel(variant, n_tiles, reps, lay):
    n_grid = n_tiles * reps
    seed_i, endmask_i, fold = int(lay.seed), int(lay.endmask), lay.fold
    fields = lay.fields

    def kernel(bscal_ref, btab_ref, warm_ref, streams_ref, out_ref, d_scr, cnt_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _i1():
            d_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _i2():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)

        if variant == "row0":
            b_rows = [jax.lax.broadcast_in_dim(btab_ref[0], (R, 128), (1,))]
        else:
            b_rows = _broadcast_rows(btab_ref[:], 2, R)
        warm = None if variant in ("nowarm", "row0") else warm_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                D, counts = carry
                blk = None
                for j in range(UNROLL):
                    t = u * UNROLL + j
                    byte = streams_ref[t].astype(jnp.int32)
                    B = jnp.take_along_axis(b_rows[0], jnp.minimum(byte, 127), axis=1)
                    D = ((D << 1) | jnp.int32(seed_i)) & B
                    e = D & jnp.int32(endmask_i)
                    if masked:
                        e = jnp.where(t0 + t >= warm, e, 0)
                    blk = e if blk is None else blk + e
                for eb, h, w in fields:
                    counts = counts + ((blk >> eb) & jnp.int32((1 << h) - 1))
                return D, counts

            return body

        if variant == "prod":
            is_boundary = t0 < bscal_ref[0]
            D, counts = jax.lax.cond(
                is_boundary,
                lambda c: jax.lax.fori_loop(0, T_TILE // UNROLL, make_body(True), c),
                lambda c: jax.lax.fori_loop(0, T_TILE // UNROLL, make_body(False), c),
                (d_scr[:], cnt_scr[:]),
            )
        else:
            D, counts = jax.lax.fori_loop(
                0, T_TILE // UNROLL, make_body(False), (d_scr[:], cnt_scr[:])
            )
        d_scr[:] = D
        cnt_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _f():
            out_ref[:] = cnt_scr[:]

    return kernel


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    lay = bitap_scan.plan_bitap(machine)
    eng = bitap_scan.BitapAcEngine(machine)
    st = eng.stage(data)
    T = st.plan.time_len
    n_tiles = T // T_TILE
    n_scan = T * R * 128
    print(f"T={T} n_tiles={n_tiles}", flush=True)

    def build(variant, reps):
        kernel = make_kernel(variant, n_tiles, reps, lay)

        @jax.jit
        def run(bscal, btab, warm, streams_u8):
            streams = streams_u8.reshape(T, R, 128)
            return pl.pallas_call(
                kernel,
                grid=(n_tiles * reps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((R, 128), jnp.int32),
                    pltpu.VMEM((R, 128), jnp.int32),
                ],
            )(bscal, btab, warm, streams)

        return run

    for variant in ("prod", "nocond", "nowarm", "row0"):
        fns = {r: build(variant, r) for r in (2, 602)}

        def go(r):
            return np.asarray(
                fns[r](st.bscal, eng._btab_dev, st.warm_t, st.streams_dev)
            )

        go(2); go(602)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter(); go(2); t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); go(602); t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / 600)
        print(f"{variant}: {n_scan/best/1e9:.1f} GB/s (slope {best*1e3:.3f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
