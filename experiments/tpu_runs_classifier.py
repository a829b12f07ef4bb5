"""Test the gather-bound hypothesis: replace the classmap GATHER with an
ALU compare chain and keep only the table gather (1 gather/byte).

The nomask experiment showed removing ALU ops changes nothing at ~112 GB/s,
so the bound must be the 2 gathers/byte.

Variants (results: base 105.0, wruns 150.8 COUNTS-MATCH, nocls 164.7 GB/s;
wruns8 fails to compile — Mosaic rejects u8 vector ops):
  base    production-style loop: classmap gather (fold) + table gather
  wruns   telescoping weighted compare chain cls = cm[0] + sum d_i*[b>=s_i]
          over classmap value boundaries; PRODUCTION table unchanged —
          this is what shipped as `wpairs` in ops/pallas_scan.py
  wruns8  the same chain in uint8 (4x element density idea) — dead end
  runs    rank-indexed re-tabled variant (overflows one row for the
          3-needle machine; kept for reference)
  nocls   table gather with idx = sbase + (b & 7) (WRONG counts; pure
          1-gather speed floor without any classifier)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import (
    CompressedMachine,
    PallasAcEngine,
    _broadcast_rows,
    _STATE_BITS,
)
from alfred_margaret_tpu.bench.dataformat import synth_corpus

NEEDLES = ["tshirt", "shirts", "shorts"]
N_MB = 64
ROUNDS = 5
R, T_TILE, UNROLL = 256, 128, 8


def runs_of(classmap: np.ndarray):
    """(run_starts[1:], rank_to_class) for the 256-entry classmap."""
    starts = [0]
    for b in range(1, 256):
        if classmap[b] != classmap[b - 1]:
            starts.append(b)
    rank_cls = np.array([classmap[s] for s in starts], dtype=np.int64)
    return np.array(starts[1:], dtype=np.int32), rank_cls


def retable(comp: CompressedMachine, machine):
    """Re-index the packed table by (state, rank) instead of (state, class)."""
    starts, rank_cls = runs_of(np.resize(comp.classmap, 256))
    n_runs = len(rank_cls)
    k = comp.k
    packed = comp.packed.reshape(-1)
    # entry'(s, r) = packed[s*k + class(r)] with the state field rescaled
    # from state*k to state*n_runs.
    out = np.zeros((comp.n_states, n_runs), dtype=np.int64)
    for s in range(comp.n_states):
        for r in range(n_runs):
            v = int(packed[s * k + rank_cls[r]])
            cnt, st = v >> _STATE_BITS, (v & ((1 << _STATE_BITS) - 1)) // k
            out[s, r] = (cnt << _STATE_BITS) | (st * n_runs)
    flat = out.reshape(-1)
    rows = -(-len(flat) // 128)
    pad = np.zeros(rows * 128, dtype=np.int64)
    pad[: len(flat)] = flat
    return pad.astype(np.int32), starts, n_runs, rows


def make_kernel(mode, rows, n_tiles, reps, starts=()):
    n_grid = n_tiles * reps

    def kernel(tab_ref, st_ref, out_ref, s_scr, c_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _i():
            s_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _c():
            c_scr[:] = jnp.zeros((R, 128), jnp.int32)

        row_b = _broadcast_rows(tab_ref[:], rows, R)
        cm0 = row_b[rows - 1] if mode == "base" else None  # unused slot

        def body(u, carry):
            sbase, counts = carry
            vsum = None
            for j in range(UNROLL):
                b = st_ref[u * UNROLL + j].astype(jnp.int32)
                if mode == "base":
                    cls = jnp.take_along_axis(cm0, jnp.minimum(b, 127), axis=1)
                elif mode == "runs":
                    cls = jnp.zeros((R, 128), jnp.int32)
                    for s0 in starts:
                        cls = cls + (b >= s0).astype(jnp.int32)
                elif mode == "wruns":
                    # telescoping weighted chain: cls = sum di * [b >= si]
                    # (starts here is ((s_i, d_i), ...)); table unchanged.
                    cls = jnp.zeros((R, 128), jnp.int32)
                    for s0, d0 in starts:
                        cls = cls + jnp.where(b >= s0, jnp.int32(d0), jnp.int32(0))
                elif mode == "wruns8":
                    # same chain in uint8 (4x element density; mod-256
                    # arithmetic is exact since the final class < 256).
                    b8 = st_ref[u * UNROLL + j]
                    cls8 = jnp.zeros((R, 128), jnp.uint8)
                    for s0, d0 in starts:
                        cls8 = cls8 + jnp.where(
                            b8 >= jnp.uint8(s0), jnp.uint8(d0 & 0xFF), jnp.uint8(0)
                        )
                    cls = cls8.astype(jnp.int32)
                else:  # nocls
                    cls = b & 7
                v = jnp.take_along_axis(row_b[0], sbase + cls, axis=1)
                sbase = v
                vsum = v if vsum is None else vsum + v
            counts = counts + (vsum >> _STATE_BITS)
            return sbase, counts

        sbase, counts = jax.lax.fori_loop(
            0, T_TILE // UNROLL, body, (s_scr[:], c_scr[:])
        )
        s_scr[:] = sbase
        c_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _f():
            out_ref[:] = c_scr[:]

    return kernel


def run_mode(mode, tab, rows, streams_dev, T, reps, starts=()):
    n_tiles = T // T_TILE
    kernel = make_kernel(mode, rows, n_tiles, reps, starts)

    @jax.jit
    def go(tab, streams):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles * reps,),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(tab, streams.reshape(T, R, 128))

    t0 = time.perf_counter()
    c = np.asarray(go(tab, streams_dev))
    print(f"  {mode} reps={reps}: warmup {time.perf_counter()-t0:.1f}s count={c.sum()}")
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        c = np.asarray(go(tab, streams_dev))
        best = min(best, time.perf_counter() - t0)
    return best, int(c.astype(np.int64).sum())


if __name__ == "__main__":
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    comp = CompressedMachine.from_machine(machine, force_packing=1)
    tab_runs, STARTS, n_runs, rows_runs = retable(comp, machine)
    print(f"k={comp.k} n_runs={n_runs} n_entries={machine.n_states * n_runs} rows={rows_runs}")

    # weighted-chain (s_i, delta_i) pairs over the ORIGINAL classmap.
    cm256 = np.resize(comp.classmap, 256).astype(np.int64)
    wpairs = []
    prev = cm256[0]
    assert prev == 0, "class of byte 0 expected 0"
    for b in range(1, 256):
        if cm256[b] != cm256[b - 1]:
            wpairs.append((b, int(cm256[b] - cm256[b - 1])))
    WPAIRS = tuple(wpairs)
    print(f"wruns chain length: {len(WPAIRS)}")

    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    eng = PallasAcEngine(machine)
    st = eng.stage(data)
    expected = eng.count_staged(st)
    print("expected count:", expected)
    T = st.plan.time_len

    # base table: classmap in the last row slot, table in row 0 (the base
    # kernel reads classmap from row_b[rows-1] = a second row we append).
    cm = np.zeros(128, dtype=np.int32)
    cm[:] = [np.resize(comp.classmap, 256)[min(b, 127)] for b in range(128)]
    tab_base = np.zeros((2, 128), dtype=np.int32)
    tab_base[0] = comp.packed.reshape(-1)[:128]
    tab_base[1] = cm
    STARTS_list = [int(s) for s in STARTS]
    STARTS = tuple(STARTS_list)

    n_full = len(data)
    base_count = None
    tab_prod = np.zeros((1, 128), dtype=np.int32)
    tab_prod[0, : min(128, len(comp.packed))] = comp.packed[:128]
    for mode, tab, rows, starts in [
        ("wruns8", jnp.asarray(tab_prod), 1, WPAIRS),
    ]:
        r_lo, r_hi = 2, 34
        t_lo, c_lo = run_mode(mode, tab, rows, st.streams_dev, T, r_lo, starts)
        t_hi, c_hi = run_mode(mode, tab, rows, st.streams_dev, T, r_hi, starts)
        bps = (r_hi - r_lo) * n_full / (t_hi - t_lo)
        # These kernels skip boundary masking (uniform-speed probe), so
        # compare base vs runs (must be identical), not vs production.
        ok = ""
        if mode == "base":
            base_count = c_lo
            ok = f"(count {c_lo}, production-masked {r_lo * expected})"
        elif mode in ("wruns", "wruns8"):
            ok = "COUNTS-OK" if c_lo == 588304 * r_lo // 2 else f"COUNTS-BAD({c_lo})"
        print(f"{mode}: {bps/1e9:.1f} GB/s {ok}")
