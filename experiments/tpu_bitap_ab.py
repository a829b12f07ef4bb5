"""Paired A/B: production BitapAcEngine.count_staged vs the raw probe
kernel on the SAME staged array, interleaved per round.

Round-4 context: absolute bitap rates on the relay chip swing 172-639
GB/s across runs while the dense DFA control is stable at ~170 — the
bitap loop is HBM-bound and the chip's effective memory bandwidth is
shared/variable.  Absolute numbers are weather; the paired ratio
raw/prod is the signal.  If the ratio is ~1 every round, the production
scaffold (warm cond, SMEM scalar, masking) costs nothing and prod runs
at whatever the chip gives that minute.
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
N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("ROUNDS", "10"))
R, T_TILE, UNROLL = 256, 128, 8


def make_raw_kernel(n_tiles, reps, wl):
    n_grid = n_tiles * reps
    seed_i, endmask_i = int(wl.seed), int(wl.endmask)
    fields = wl.fields

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


def build_raw(T, reps, wl):
    n_tiles = T // T_TILE
    kernel = make_raw_kernel(n_tiles, reps, wl)

    @jax.jit
    def run(btab, streams):
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


def slope(fn, r_lo=2, r_hi=402):
    t0 = time.perf_counter(); np.asarray(fn(r_lo)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(fn(r_hi)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (r_hi - r_lo)


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    eng = bitap_scan.BitapAcEngine(machine)
    st = eng.stage(data)
    T = st.plan.time_len
    n_scan = T * R * 128
    wl = eng.bitap.words[0]

    raw_fns = {r: build_raw(T, r, wl) for r in (2, 402)}
    prod = lambda r: eng.count_staged(st, reps=r)
    raw = lambda r: raw_fns[r](eng._btab_dev, st.streams_dev)

    # compile/warm both
    base_prod = prod(2)
    base_raw = int(np.asarray(raw(2)).astype(np.int64).sum())
    prod(402); np.asarray(raw(402))
    print(f"T={T}  prod count={base_prod}  raw sum(2 reps)={base_raw}", flush=True)

    ratios = []
    for i in range(ROUNDS):
        s_prod = slope(prod)
        s_raw = slope(raw)
        r_prod, r_raw = n_scan / s_prod / 1e9, n_scan / s_raw / 1e9
        ratios.append(s_prod / s_raw)
        print(f"round {i}: prod {r_prod:6.1f} GB/s   raw {r_raw:6.1f} GB/s   "
              f"prod/raw slope ratio {ratios[-1]:.3f}", flush=True)
    print(f"median ratio {np.median(ratios):.3f}  "
          f"best prod {n_scan/min(slope(prod) for _ in range(2))/1e9:.1f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
