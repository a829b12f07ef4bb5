"""Probe: bitap/shift-AND per-byte primitive vs the dense DFA gather loop.

Hypothesis (round-4): the dense count kernel is capped at the measured
1-gather/byte floor (~165 GB/s, experiments/tpu_runs_classifier.py `nocls`),
because the transition gather owns the bottleneck port while ALU ops ride
along nearly free (wruns 150.8 vs nocls 164.7).  A bitap register automaton
needs ZERO gathers:

    D   = ((D << 1) | SEED) & B[byte]      # 3 dependent ALU ops
    acc += D & ENDMASK                     # 2 ALU ops (guard-bit fields)

with B[byte] computed by the telescoping weighted compare chain (the
`wpairs` trick, ~1.6 ALU/boundary, fully parallel) or one independent
gather.  If pure-ALU issue throughput beats the gather port, bitap breaks
the plateau for machines whose needle tracks fit one int32 (sum of needle
byte lengths <= ~30).

Variants:
  dfa           production PallasAcEngine count (control)
  bitap_chain   B via compare chain, counts accumulated+flushed (exact)
  bitap_gather  B via fold gather (1 row), counts (exact)
  bitap_sticky  B via chain, sticky OR only (contains floor)

Counts are verified against a vectorized numpy DFA scan of the same
streams.  Streams here are independent contiguous corpus slices (no
overlap/warm machinery — this is a primitive-rate probe, not the engine).
"""
import sys, os, time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = int(os.environ.get("PROBE_MB", "64"))
R, T_TILE, UNROLL = 256, 128, 8
S = R * 128


def bitap_layout(needles):
    """(seed, endmask, btab[256], fields) — one bit track per needle."""
    seed = 0
    endmask = 0
    btab = np.zeros(256, dtype=np.int64)
    fields = []  # (end_bit, headroom_bits)
    off = 0
    for nd in needles:
        bs = nd.encode("utf-8")
        seed |= 1 << off
        for p, b in enumerate(bs):
            btab[b] |= 1 << (off + p)
        end = off + len(bs) - 1
        endmask |= 1 << end
        fields.append(end)
        off = end + 1
    assert off <= 30, "tracks exceed int32"
    # headroom of field i = distance to next field's end (or to bit 30)
    heads = []
    for i, e in enumerate(fields):
        nxt = fields[i + 1] if i + 1 < len(fields) else 30
        heads.append(nxt - e)
    return seed, endmask, btab, list(zip(fields, heads))


def b_chain_pairs(btab):
    """Telescoping (start, delta) pairs for the 256-entry B table."""
    pairs = []
    for b in range(1, 256):
        if btab[b] != btab[b - 1]:
            pairs.append((b, int(btab[b]) - int(btab[b - 1])))
    return int(btab[0]), pairs


def make_bitap_kernel(mode, n_tiles, reps, seed, endmask, bpairs, fields,
                      btab_rows=None):
    n_grid = n_tiles * reps
    flush_cap = min(h for _, h in fields)
    assert UNROLL < (1 << flush_cap), "unroll overflows count fields"

    def kernel(btab_ref, streams_ref, out_ref, d_scr, acc_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_acc():
            acc_scr[:] = jnp.zeros((R, 128), jnp.int32)

        if mode == "gather":
            brow = jax.lax.broadcast_in_dim(btab_ref[0], (R, 128), (1,))

        def body(u, carry):
            D, acc = carry
            blk = None
            for j in range(UNROLL):
                t = u * UNROLL + j
                byte = streams_ref[t].astype(jnp.int32)
                if mode == "gather":
                    B = jnp.take_along_axis(brow, jnp.minimum(byte, 127), axis=1)
                else:
                    init, pairs = bpairs
                    B = jnp.full(byte.shape, init, jnp.int32)
                    for s0, d0 in pairs:
                        B = B + jnp.where(byte >= s0, jnp.int32(d0), jnp.int32(0))
                D = ((D << 1) | jnp.int32(seed)) & B
                if mode == "sticky":
                    acc = acc | (D & jnp.int32(endmask))
                else:
                    e = D & jnp.int32(endmask)
                    blk = e if blk is None else blk + e
            if mode != "sticky":
                for eb, h in fields:
                    acc = acc + ((blk >> eb) & jnp.int32((1 << h) - 1))
            return D, acc

        D, acc = jax.lax.fori_loop(
            0, T_TILE // UNROLL, body, (d_scr[:], acc_scr[:])
        )
        d_scr[:] = D
        acc_scr[:] = acc

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = acc_scr[:]

    return kernel


def run_bitap(mode, streams_dev, btab_dev, T, reps, layout):
    seed, endmask, btab, fields = layout
    bpairs = b_chain_pairs(btab)
    n_tiles = T // T_TILE
    kernel = make_bitap_kernel(mode, n_tiles, reps, seed, endmask, bpairs, fields)

    @jax.jit
    def go(btab_a, streams):
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
        )(btab_a, streams)

    return go(btab_dev, streams_dev)


def oracle_counts(machine, streams_np):
    """Vectorized numpy DFA over [T, S] independent streams."""
    T, Sn = streams_np.shape
    delta = machine.delta
    mc = machine.match_count
    state = np.zeros(Sn, dtype=np.int64)
    total = 0
    for t in range(T):
        state = delta[state, streams_np[t]]
        total += int(mc[state].sum())
    return total


def main():
    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    layout = bitap_layout(NEEDLES)
    seed, endmask, btab, fields = layout
    print(f"layout: seed={seed:#x} endmask={endmask:#x} fields={fields} "
          f"boundaries={len(b_chain_pairs(btab)[1])}", flush=True)

    # Stream layout: S independent contiguous slices, time-major.
    per = len(data) // S
    T = (per // T_TILE) * T_TILE
    streams_np = data[: T * S].reshape(S, T).T.copy()  # [T, S]
    print(f"T={T} S={S} scanned={T*S/1e6:.1f} MB", flush=True)

    exp = oracle_counts(machine, streams_np)
    print(f"oracle count = {exp}", flush=True)

    streams_dev = jax.device_put(streams_np.reshape(T, R, 128))
    btab_np = np.zeros((2, 128), dtype=np.int64)
    btab_np.reshape(-1)[:256] = btab
    assert (btab[127:] == 0).all(), "fold gather requires ASCII needles"
    btab_dev = jnp.asarray(btab_np.astype(np.int32))

    def timed(fn, label, expect=None, per_rep_bytes=T * S):
        # Slope method: the relay RTT jitters ~10 ms, so the rep spread must
        # put >= 100 ms of kernel time between the two launches.
        lo_r, hi_r = 2, 402
        out = np.asarray(fn(lo_r))  # warm/compile
        if expect is not None:
            got = int(out.astype(np.int64).sum())
            ok = "OK" if got == expect * lo_r else f"MISMATCH exp {expect*lo_r}"
            print(f"{label}: count {got} {ok}", flush=True)
        np.asarray(fn(hi_r))  # compile hi
        best = None
        for _ in range(7):
            t0 = time.perf_counter(); np.asarray(fn(lo_r)); t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(fn(hi_r)); t_hi = time.perf_counter() - t0
            sl = (t_hi - t_lo) / (hi_r - lo_r)
            best = sl if best is None else min(best, sl)
        rate = per_rep_bytes / best
        print(f"{label}: {rate/1e9:.1f} GB/s (slope {best*1e3:.3f} ms/rep)",
              flush=True)
        return rate

    # control: production engine
    eng = PallasAcEngine(machine, n_streams=S, t_tile=T_TILE)
    st = eng.stage(data)
    dfa_bytes = st.plan.time_len * S
    timed(lambda r: eng.count_staged(st, reps=r), "dfa(control)",
          per_rep_bytes=dfa_bytes)

    timed(lambda r: run_bitap("chain", streams_dev, btab_dev, T, r, layout),
          "bitap_chain", expect=exp)
    timed(lambda r: run_bitap("gather", streams_dev, btab_dev, T, r, layout),
          "bitap_gather", expect=exp)
    timed(lambda r: run_bitap("sticky", streams_dev, btab_dev, T, r, layout),
          "bitap_sticky")


if __name__ == "__main__":
    main()
