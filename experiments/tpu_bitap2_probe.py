"""Probe: stride-2 EXACT bitap for small-alphabet needle sets.

The production bitap kernel costs 1 independent gather per byte per word
(~170/V GB/s under load; HBM-bound ~640 under light load).  For needle
sets whose distinct bytes fit a small alphabet Σ (|Σ| <= 10), a PERFECT
pair index exists within one 128-entry row:

    r(b)  = rank of b in Σ, 0 for any other byte   (compare chain, |Σ| adds)
    idx   = r(b1) * (|Σ|+1) + r(b2)                 <= 120 < 128

making one register step per TWO bytes with ONE gather per word — 0.5
gathers/byte — and the index is COLLISION-FREE (entries touching rank 0
are never set, so pads and foreign bytes kill the register).  Tracks are
per-needle per-ALIGNMENT chains (even/odd start), each with its own end
bit and count field, so counts are exact: every occurrence fires exactly
one alignment's end bit.

If the under-load law is gather-ISSUE-bound, this doubles the headline
kernel's loaded rate (~170 -> ~340 GB/s at V=1); under light load both
run at the HBM roof.  This probe measures the paired stride-2 vs
production-bitap rate in one session on the config-1 needle set
(tshirt/shirts/shorts: Σ = {h,i,o,r,s,t}, 6 letters), with counts
verified against the scalar oracle.  Streams are independent contiguous
slices (primitive-rate probe; warm/boundary machinery comes with
production if the rate justifies it — end bits near slice boundaries are
simply not compared, so the probe corpus embeds no matches within 8
bytes of a slice edge... instead we just compare TOTALS against the same
slicing's oracle).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.bench.dataformat import synth_corpus

N_MB = int(os.environ.get("PROBE_MB", "64"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "5"))
R, T_TILE = 256, 128
S = R * 128
NEEDLES = ["tshirt", "shirts", "shorts"]


def log(m):
    print(m, flush=True)


# --- plan -------------------------------------------------------------


def plan2(needles):
    """(sigma, rank_pairs, seed, endmask_even, endmask_odd, btab[128],
    fields) — per-needle even/odd chains, each a count field."""
    sigma = sorted({b for nd in needles for b in nd.encode()})
    A = len(sigma) + 1
    assert A * A <= 128, "alphabet too wide for the perfect pair index"
    rank = {b: i + 1 for i, b in enumerate(sigma)}

    def chains(nd):
        ev, i = [], 0
        while i < len(nd):
            ev.append((nd[i], nd[i + 1] if i + 1 < len(nd) else None))
            i += 2
        od, i = [(None, nd[0])], 1
        while i < len(nd):
            od.append((nd[i], nd[i + 1] if i + 1 < len(nd) else None))
            i += 2
        return ev, od

    seed = 0
    endmask_e = endmask_o = 0
    btab = np.zeros(128, dtype=np.int64)
    fields = []  # (end_bit, parity) parity 0: ends at b2 (odd byte pos), 1: ends at b1
    off = 0
    for nd in needles:
        bs = nd.encode()
        ev, od = chains(bs)
        for c, is_odd_start in ((ev, False), (od, True)):
            W = len(c)
            start = off
            seed |= 1 << start
            for p, (b1, b2) in enumerate(c):
                r1s = [rank[b1]] if b1 is not None else range(A)
                r2s = [rank[b2]] if b2 is not None else range(A)
                for r1 in r1s:
                    for r2 in r2s:
                        btab[r1 * A + r2] |= 1 << (start + p)
            end = start + W - 1
            # parity of the END byte: even-start, even-length -> ends at
            # b2; even-start odd-length -> ends at b1; odd-start flips.
            ends_at_b1 = (len(bs) % 2 == 1) != is_odd_start
            if ends_at_b1:
                endmask_o |= 1 << end
            else:
                endmask_e |= 1 << end
            fields.append((end, 1 if ends_at_b1 else 0))
            off = end + 2  # 1 guard bit of headroom per field (flush every step block)
    assert off - 1 <= 30, f"tracks need {off} bits"
    # Exactness note: CONSTRAINED positions never set rank-0 entries, so a
    # foreign byte (or pad) kills any in-needle position; WILDCARD chain
    # boundaries (the byte before an odd-start needle / after an odd-end
    # one) deliberately accept rank 0 — those bytes are outside the match.
    return sigma, A, seed, endmask_e | endmask_o, btab, fields


# --- kernel -----------------------------------------------------------


def make_kernel2(n_tiles, reps, A, seed, endmask, fields, sigma, unroll=8):
    n_grid = n_tiles * reps
    # rank chain: r(b) = sum(b >= s_i) for consecutive sigma values is NOT
    # the rank (non-contiguous alphabet); use equality-sum: r = sum_i
    # (i+1)*(b == sigma_i) -> |sigma| compares+adds.
    sig = list(sigma)

    def rank_of(byte):
        r = None
        for i, sv in enumerate(sig):
            c = jnp.where(byte == sv, jnp.int32(i + 1), jnp.int32(0))
            r = c if r is None else r + c
        return r

    def kernel(btab_ref, streams_ref, out_ref, d_scr, cnt_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _i():
            d_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _c():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)

        row = jax.lax.broadcast_in_dim(btab_ref[0], (R, 128), (1,))

        def body(u, carry):
            D, counts = carry
            blk = None
            for j in range(unroll):
                t = (u * unroll + j) * 2
                b1 = streams_ref[t].astype(jnp.int32)
                b2 = streams_ref[t + 1].astype(jnp.int32)
                idx = rank_of(b1) * A + rank_of(b2)
                B = jnp.take_along_axis(row, idx, axis=1)
                D = ((D << 1) | jnp.int32(seed)) & B
                e = D & jnp.int32(endmask)
                # Each field has ONE guard bit (never set by any table
                # entry, so D's guard bits stay 0 and cannot leak into the
                # next track): a 2-step partial sum <= 2 fits the
                # (end, guard) bit pair; flush with a 2-bit mask.
                if j % 2 == 0:
                    blk = e
                else:
                    blk = blk + e
                    for eb, _ in fields:
                        counts = counts + ((blk >> eb) & jnp.int32(3))
            return D, counts

        D, counts = jax.lax.fori_loop(
            0, (T_TILE // 2) // unroll, body, (d_scr[:], cnt_scr[:])
        )
        d_scr[:] = D
        cnt_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _f():
            out_ref[:] = cnt_scr[:]

    return kernel


def build_fn2(T, reps, A, seed, endmask, fields, sigma):
    n_tiles = T // T_TILE
    kernel = make_kernel2(n_tiles, reps, A, seed, endmask, fields, sigma)
    rc = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(btab, streams_u8):
        streams = streams_u8.reshape(T, R, 128)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles * reps,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128), lambda i: (i % n_tiles, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=rc,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(btab, streams)

    return run


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    sigma, A, seed, endmask, btab, fields = plan2(NEEDLES)
    log(f"sigma={bytes(sigma)!r} A={A} fields={len(fields)} bits<=~{max(e for e,_ in fields)+1}")

    corpus = synth_corpus(NEEDLES, N_MB << 20, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    emit = len(data) // S
    T = (emit // T_TILE) * T_TILE
    streams = np.ascontiguousarray(data[: S * T].reshape(S, T).T)
    n_eff = T * S
    streams_dev = jax.device_put(jnp.asarray(streams))
    np.asarray(streams_dev[0, :8])

    # Oracle on the SAME slicing (per-slice independent scans).
    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

    m = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    cpp = CppAcEngine(m)
    want = sum(
        cpp.count(np.ascontiguousarray(streams[:, s_]))
        for s_ in range(0, S, max(1, S // 64))
    )  # sampled columns only (full host pass is slow); compare sampled sums

    btab_dev = jnp.asarray(btab[None, :].astype(np.int32))
    fn = build_fn2(T, 1, A, seed, endmask, fields, sigma)
    out = np.asarray(fn(btab_dev, streams_dev))
    got_sample = sum(
        int(out.reshape(-1)[s_]) for s_ in range(0, S, max(1, S // 64))
    )
    log(f"sampled-column counts: got {got_sample} want {want} "
        f"{'OK' if got_sample == want else 'MISMATCH'}")
    if got_sample != want:
        # find first mismatching sampled column for debugging
        for s_ in range(0, S, max(1, S // 64)):
            w = cpp.count(np.ascontiguousarray(streams[:, s_]))
            g = int(out.reshape(-1)[s_])
            if w != g:
                log(f"  first mismatch at stream {s_}: got {g} want {w}")
                break
        return

    # Paired rates: stride-2 exact vs production bitap on the same data.
    from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine

    def slope(call, r_hi):
        times = {}
        for reps in (1, r_hi):
            call(reps)
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                call(reps)
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        dt = times[r_hi] - times[1]
        return ((r_hi - 1) * n_eff / dt if dt > 0 else float("nan")), times

    fns = {}

    def call2(reps):
        if reps not in fns:
            fns[reps] = build_fn2(T, reps, A, seed, endmask, fields, sigma)
        np.asarray(fns[reps](btab_dev, streams_dev))

    r_hi = max(101, int(0.15 * 800e9 / n_eff) | 1)
    rate2, t2 = slope(call2, r_hi)
    log(f"stride-2 exact slope {rate2/1e9:6.1f} GB/s  t1 {t2[1]*1e3:6.2f} "
        f"ms t{r_hi} {t2[r_hi]*1e3:8.2f} ms")

    eng = BitapAcEngine(m)
    st = eng.stage(data)

    def call1(reps):
        eng.count_staged(st, reps)

    rate1, t1 = slope(call1, r_hi)
    log(f"prod bitap     slope {rate1/1e9:6.1f} GB/s  t1 {t1[1]*1e3:6.2f} "
        f"ms t{r_hi} {t1[r_hi]*1e3:8.2f} ms  stride2/bitap = {rate2/rate1:4.2f}x")


if __name__ == "__main__":
    main()
