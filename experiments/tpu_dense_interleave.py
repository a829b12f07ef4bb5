"""Does G-way state-group interleaving break the dense kernel's
dependent-gather floor?

Facts: the dense loop (one DEPENDENT (R,128) dynamic_gather per byte) is
capped at ~165 GB/s; the bitap loop (one INDEPENDENT gather of the same
shape + more ALU) runs at 639 GB/s.  Hypothesis: Mosaic schedules the big
gather as one coarse op, so consecutive dependent steps serialize at
latency, not issue rate.  Splitting the stream dimension into G
independent sub-arrays gives the scheduler G parallel dependence chains
inside the unrolled body — if the floor is chain latency, throughput
should scale toward the issue rate with G.

Variants: dense count loop (3-needle machine, single-row table, wpairs
classmap, nomask carry — production fast-path shape) at G = 1, 2, 4, 8.
Counts verified at G=1 vs the host DFA; other G only restructure the
schedule, parity asserted vs G=1.
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
from alfred_margaret_tpu.ops.pallas_scan import (
    CompressedMachine,
    _classmap_wpairs,
    _STATE_BITS,
)

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = int(os.environ.get("PROBE_MB", "64"))
R, T_TILE, UNROLL = 256, 128, 8
S = R * 128


def make_kernel(G, n_tiles, reps, wpairs, state_bits):
    n_grid = n_tiles * reps
    Rg = R // G

    def kernel(tab_ref, streams_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _i1():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _i2():
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        rows = [jax.lax.broadcast_in_dim(tab_ref[0], (Rg, 128), (1,))]
        init, pairs = wpairs

        def cls_of(byte):
            c = jnp.full(byte.shape, init, jnp.int32)
            for s0, d0 in pairs:
                c = c + jnp.where(byte >= s0, jnp.int32(d0), jnp.int32(0))
            return c

        def body(u, carry):
            # carry: (s_0..s_{G-1}, counts_0..counts_{G-1})
            st = list(carry[:G])
            cnts = list(carry[G:])
            vsum = [None] * G
            for j in range(UNROLL):
                t = u * UNROLL + j
                byte = streams_ref[t].astype(jnp.int32)
                for g in range(G):
                    b_g = byte[g * Rg : (g + 1) * Rg]
                    cls = cls_of(b_g)
                    # nomask raw-entry carry (single physical row)
                    v = jnp.take_along_axis(rows[0], (st[g] + cls) & 127, axis=1)
                    st[g] = v
                    vsum[g] = v if vsum[g] is None else vsum[g] + v
            for g in range(G):
                cnts[g] = cnts[g] + (vsum[g] >> state_bits)
            return (*st, *cnts)

        carry0 = tuple(
            s_scr[g * Rg : (g + 1) * Rg] for g in range(G)
        ) + tuple(c_scr[g * Rg : (g + 1) * Rg] for g in range(G))
        out = jax.lax.fori_loop(0, T_TILE // UNROLL, body, carry0)
        for g in range(G):
            s_scr[g * Rg : (g + 1) * Rg] = out[g]
            c_scr[g * Rg : (g + 1) * Rg] = out[G + g]

        @pl.when(tile == n_grid - 1)
        def _f():
            out_ref[:] = c_scr[:]

    return kernel


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    comp = CompressedMachine.from_machine(machine, force_packing=1)
    assert comp.rows == 1, comp.rows
    cm = np.resize(comp.classmap, 256)
    wpairs = _classmap_wpairs(cm)
    tab = jnp.asarray(comp.packed.reshape(1, 128))

    per = len(data) // S
    T = (per // T_TILE) * T_TILE
    streams_np = data[: T * S].reshape(S, T).T.copy()
    streams_dev = jax.device_put(streams_np.reshape(T, R, 128))
    n_tiles = T // T_TILE
    n_scan = T * S
    print(f"T={T}", flush=True)

    # host oracle
    delta, mc = machine.delta, machine.match_count
    state = np.zeros(S, dtype=np.int64)
    exp = 0
    for t in range(T):
        state = delta[state, streams_np[t]]
        exp += int(mc[state].sum())
    print(f"oracle = {exp}", flush=True)

    for G in (1, 2, 4, 8):
        fns = {}
        for reps in (2, 402):
            kernel = make_kernel(G, n_tiles, reps, wpairs, comp.state_bits)

            @jax.jit
            def run(tab_a, streams, _k=kernel, _r=reps):
                return pl.pallas_call(
                    _k,
                    grid=(n_tiles * _r,),
                    in_specs=[
                        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
                )(tab_a, streams)

            fns[reps] = run

        def go(r):
            return np.asarray(fns[r](tab, streams_dev))

        base = go(2)
        got = int(base.astype(np.int64).sum())
        ok = "OK" if got == 2 * exp else f"MISMATCH exp {2*exp}"
        go(402)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter(); go(2); t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); go(402); t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / 400)
        print(f"G={G}: {n_scan/best/1e9:.1f} GB/s (slope {best*1e3:.3f} ms) "
              f"count {ok}", flush=True)


if __name__ == "__main__":
    main()
