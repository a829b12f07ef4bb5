"""Probe: stride-2 nibble-hash candidate filter — the mid-tier prefilter
primitive (round-5, VERDICT item 1).

Hypothesis: a shift-AND register automaton over PAIR symbols (one step per
2 bytes, table indexed by the nibble hash ``((b1 & 15) << 4) | (b2 & 15)``)
halves the gather count per byte, so V filter words should run at roughly
``2 * 170 / V`` GB/s — above the dense kernel's 1-gather floor (~165) even
at V=2, and far above comb16's g=6+ mid-tier rate (~25 GB/s at 100
needles).  End bits are *candidates* (nibble collisions + union buckets
give false positives); exact counts then need
  (a) an in-kernel exact path for short needles (rolling-window ALU
      compares, no gathers), and
  (b) host verification of compacted candidate positions.

This probe measures the pieces that decide whether the full pipeline can
beat the 25 GB/s mid-tier floor:

  1. kernel    stride-2 V-word filter + bitmap write + K short-needle
               compares, rep-slope rate for V in {1,2,3,4}, K in {0,4}
  2. compact   in-jit two-level word compaction + the ONE [2, cap+1]
               fetch, at synthetic candidate densities
  3. d2h       device->host fetch bandwidth at the sizes the candidate
               fetch will use
  4. verify    native am_states_at replay rate at candidate-like position
               counts (upper bound for the suffix-index verifier)

Counts are cross-checked against a numpy simulation of the same chain
semantics on a slice (correctness of the real engine is the test suite's
job; here we only guard against a silently-wrong kernel measuring a
different loop).
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
R, T_TILE = 256, 64
S = R * 128
PAIRS_TILE = T_TILE // 2


def log(msg):
    print(msg, flush=True)


# ---------------------------------------------------------------------------
# Plan: union-bucket pair tracks for a needle list (probe-grade planner)
# ---------------------------------------------------------------------------


def _chains(nd: bytes):
    """Two alignment chains (lists of (b1_or_None, b2_or_None)) per
    needle; None = wildcard half."""
    L = len(nd)
    ev = []  # starts at even byte offset
    i = 0
    while i < L:
        if i + 1 < L:
            ev.append((nd[i] & 15, nd[i + 1] & 15))
        else:
            ev.append((nd[i] & 15, None))
        i += 2
    od = [(None, nd[0] & 15)]  # starts at odd byte offset
    i = 1
    while i < L:
        if i + 1 < L:
            od.append((nd[i] & 15, nd[i + 1] & 15))
        else:
            od.append((nd[i] & 15, None))
        i += 2
    return ev, od


def _entries(con):
    """7-bit hash entries: idx = ((b1 & 15) << 3) | (b2 & 7) — single-row
    tables (128 entries) so one word costs ONE gather per pair-step.  b1
    keeps the full nibble (end half-pairs gate the end bit: d = k/16); b2
    keeps 3 bits (start half-pairs: d = k/8)."""
    hi, lo = con
    his = range(16) if hi is None else [hi]
    los = range(8) if lo is None else [lo & 7]
    return [(h << 3) | l for h in his for l in los]


def plan_words(needles, per_bucket, n_words):
    """Pack needles into `n_words` candidate words of union buckets.

    Returns (seeds[V], endmasks[V], btabs[V][256]) — probe-grade: fixed
    needles-per-bucket, back-to-back regions, 31 usable bits per word."""
    seeds, endmasks, btabs = [], [], []
    idx = 0
    for _ in range(n_words):
        seed = endmask = 0
        btab = np.zeros(256, dtype=np.int64)
        off = 0
        while idx < len(needles):
            bucket = needles[idx : idx + per_bucket]
            chains = []
            for nd in bucket:
                ev, od = _chains(nd)
                chains += [ev, od]
            W = max(len(c) for c in chains)
            if off + W > 31:
                break
            end = off + W - 1
            for c in chains:
                start = end - len(c) + 1
                seed |= 1 << start
                for p, con in enumerate(c):
                    for e in _entries(con):
                        btab[e] |= 1 << (start + p)
            endmask |= 1 << end
            off = end + 1
            idx += per_bucket
        seeds.append(seed)
        endmasks.append(endmask)
        btabs.append(btab)
    return seeds, endmasks, btabs, idx


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def make_filter_kernel(n_tiles, reps, V, K, shorts, seeds, endmasks, with_bits):
    """Stride-2 filter: V candidate pair-words + K short-needle ALU counters.

    Grid = n_tiles * reps; per tile: PAIRS_TILE pair steps in blocks of 32
    (one bitmap word per block).  No warm/vend masking (probe streams are
    independent corpus slices)."""
    n_grid = n_tiles * reps

    def kernel(btab_ref, streams_ref, *refs):
        if with_bits:
            cnt_out, bits_out, d_scr, roll_scr, cnt_scr = refs
        else:
            cnt_out, d_scr, roll_scr, cnt_scr = refs
            bits_out = None
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((V, R, 128), jnp.int32)
            roll_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_cnt():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)

        rows = [
            jax.lax.broadcast_in_dim(btab_ref[r], (R, 128), (1,))
            for r in range(V)
        ]

        def body(w, carry):
            *D, roll, counts = carry
            D = list(D)
            bmp = jnp.zeros((R, 128), jnp.int32)
            for j in range(32):
                t = w * 64 + 2 * j
                b1 = streams_ref[t].astype(jnp.int32)
                b2 = streams_ref[t + 1].astype(jnp.int32)
                idx = ((b1 & 15) << 3) | (b2 & 7)
                anyend = None
                for v in range(V):
                    B = jnp.take_along_axis(rows[v], idx, axis=1)
                    D[v] = ((D[v] << 1) | jnp.int32(seeds[v])) & B
                    e = D[v] & jnp.int32(endmasks[v])
                    anyend = e if anyend is None else anyend | e
                if bits_out is not None:
                    bmp = bmp | jnp.where(anyend != 0, jnp.int32(1) << j, 0)
                if K:
                    roll = ((roll << 8) | b1) << 8 | b2
                    rolls = (roll, roll >> 8)
                    inc = None
                    for mask, const in shorts[:K]:
                        for rr in rolls:
                            c = jnp.where(
                                (rr & jnp.int32(mask)) == jnp.int32(const), 1, 0
                            )
                            inc = c if inc is None else inc + c
                    counts = counts + inc
            if bits_out is not None:
                bits_out[w] = bmp
            return (*D, roll, counts)

        carry0 = tuple(d_scr[v] for v in range(V)) + (roll_scr[:], cnt_scr[:])
        out = jax.lax.fori_loop(0, PAIRS_TILE // 32, body, carry0)
        for v in range(V):
            d_scr[v] = out[v]
        roll_scr[:] = out[V]
        cnt_scr[:] = out[V + 1]

        @pl.when(tile == n_grid - 1)
        def _fin():
            cnt_out[:] = cnt_scr[:]

    return kernel


def build_filter_fn(T, reps, V, K, shorts, seeds, endmasks, with_bits):
    n_tiles = T // T_TILE
    kernel = make_filter_kernel(n_tiles, reps, V, K, shorts, seeds, endmasks, with_bits)
    rc_spec = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [rc_spec]
    out_shape = [jax.ShapeDtypeStruct((R, 128), jnp.int32)]
    if with_bits:
        out_specs.append(
            pl.BlockSpec(
                (PAIRS_TILE // 32, R, 128),
                lambda i: (i % n_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((T // 64, R, 128), jnp.int32)
        )

    @jax.jit
    def run(btab, streams_u8):
        streams = streams_u8.reshape(T, R, 128)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles * reps,),
            in_specs=[
                pl.BlockSpec((V, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T_TILE, R, 128),
                    lambda i: (i % n_tiles, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_specs if with_bits else out_specs[0],
            out_shape=out_shape if with_bits else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((V, R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
        )(btab, streams)

    return run


# ---------------------------------------------------------------------------
# Oracle: numpy chain simulation on one stream slice
# ---------------------------------------------------------------------------


def numpy_filter(data, seeds, endmasks, btabs):
    """Per-pair candidate flags + short counts for one byte stream."""
    V = len(seeds)
    n_pairs = len(data) // 2
    fires = np.zeros(n_pairs, dtype=bool)
    D = [0] * V
    for t in range(n_pairs):
        b1, b2 = int(data[2 * t]), int(data[2 * t + 1])
        idx = ((b1 & 15) << 3) | (b2 & 7)
        any_e = 0
        for v in range(V):
            D[v] = ((D[v] << 1) | seeds[v]) & int(btabs[v][idx])
            any_e |= D[v] & endmasks[v]
        fires[t] = any_e != 0
    return fires


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(7)
    needles100 = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(110)
        )
    )[:100]
    needles100[:4] = ["abc", "abcd", "bcd", "c"]
    corpus = synth_corpus(needles100, N_MB << 20, hit_fraction=0.01, seed=5)
    data = np.frombuffer(corpus, dtype=np.uint8)

    long_needles = sorted(
        (n.encode() for n in needles100 if len(n) >= 5), key=len
    )
    def _i32(v):
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    shorts = []
    for n in ["c", "abc", "bcd", "abcd"]:
        b = n.encode()
        const = 0
        for x in b:
            const = (const << 8) | x
        shorts.append((_i32((1 << (8 * len(b))) - 1), _i32(const)))

    # Stream layout: contiguous slices, no overlap (probe-grade).
    emit = len(data) // S
    T = (emit // T_TILE) * T_TILE
    streams = np.ascontiguousarray(
        data[: S * T].reshape(S, T).T
    )  # [T, S]
    n_eff = T * S
    streams_dev = jax.device_put(jnp.asarray(streams))
    jax.block_until_ready(streams_dev)
    log(f"corpus {N_MB} MiB -> streams [T={T}, S={S}] = {n_eff/2**20:.0f} MiB")

    # --- 1. kernel rate sweep --------------------------------------------
    # Bucket size ~5: half-pair wildcard positions carry 16 entries per
    # needle, so k needles/bucket -> d = 16k/256 at chain boundaries; k=5
    # keeps that at 0.31 while interiors run at k/256.  Words fill until
    # the needles run out; the V sweep truncates coverage (reported).
    PER_BUCKET = int(os.environ.get("PROBE_BUCKET", "5"))
    for V in (1, 2, 3, 4):
        seeds, endmasks, btabs, used = plan_words(long_needles, PER_BUCKET, V)
        bt = np.stack(btabs).astype(np.int64)
        assert (bt >> 31 == 0).all() and bt.shape[1] == 256 and (bt[:, 128:] == 0).all()
        btab_dev = jnp.asarray(bt[:, :128].astype(np.int32))
        for K in (0, 4):
            for with_bits in ((True, False) if K == 0 else (True,)):
                tag = (
                    f"V={V} K={K} bits={int(with_bits)} "
                    f"(needles {used}/{len(long_needles)})"
                )
                fires_frac = None
                times = {}
                for reps in (1, 9):
                    fn = build_filter_fn(
                        T, reps, V, K, shorts, seeds, endmasks, with_bits
                    )
                    t0 = time.perf_counter()
                    out = fn(btab_dev, streams_dev)
                    # Materialize: on the axon relay block_until_ready does
                    # NOT block; a host fetch is the only real sync.
                    np.asarray(out[0] if with_bits else out)
                    compile_s = time.perf_counter() - t0
                    best = float("inf")
                    for _ in range(ROUNDS):
                        t0 = time.perf_counter()
                        out = fn(btab_dev, streams_dev)
                        np.asarray(out[0] if with_bits else out)
                        best = min(best, time.perf_counter() - t0)
                    times[reps] = best
                    if reps == 1 and with_bits:
                        bits = np.asarray(out[1])
                        fires_frac = float(
                            np.unpackbits(
                                (bits.reshape(-1).astype(np.int64) & 0xFFFFFFFF)
                                .astype("<u4")
                                .view(np.uint8)
                            ).mean()
                        )
                slope = (times[9] - times[1]) / 8 if times[9] > times[1] else times[9] / 9
                rate = n_eff / slope
                log(
                    f"kernel {tag}: slope {rate/1e9:7.1f} GB/s  "
                    f"t1 {times[1]*1e3:7.2f} ms t9 {times[9]*1e3:7.2f} ms  "
                    f"compile {compile_s:5.1f}s  fire/pair="
                    f"{fires_frac if fires_frac is not None else -1:.6f}"
                )

    # --- oracle check on stream 0 (V=2 plan) -----------------------------
    V = 2
    seeds, endmasks, btabs, used = plan_words(long_needles, PER_BUCKET, V)
    bt = np.stack(btabs).astype(np.int64)
    btab_dev = jnp.asarray(bt[:, :128].astype(np.int32))
    fn = build_filter_fn(T, 1, V, 0, shorts, seeds, endmasks, True)
    out = fn(btab_dev, streams_dev)
    bits = np.asarray(out[1])  # [T//64, R, 128]
    s0 = streams[:, 0]
    oracle = numpy_filter(s0, seeds, endmasks, btabs)
    got = np.zeros(T // 2, dtype=bool)
    w = bits[:, 0, 0]
    for i in range(len(w)):
        for j in range(32):
            got[i * 32 + j] = bool((int(w[i]) >> j) & 1)
    ok = bool((got == oracle).all())
    log(f"oracle stream-0 bits match: {ok} ({oracle.sum()} fires)")
    if not ok:
        bad = np.flatnonzero(got != oracle)[:5]
        log(f"  first mismatches at pairs {bad.tolist()}")

    # --- 2+3. compaction + d2h at candidate densities --------------------
    nwords = (T // 64) * S

    def compact_fn(cap, bcap, B=512):
        @jax.jit
        def run(flat):
            pad = (-flat.shape[0]) % B
            if pad:
                flat2 = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
            else:
                flat2 = flat
            wb = flat2.reshape(-1, B)
            nblocks = wb.shape[0]
            nz = wb != 0
            n = jnp.sum(nz, dtype=jnp.int32)
            touched = jnp.any(nz, axis=1)
            nb = jnp.sum(touched, dtype=jnp.int32)
            (bi,) = jnp.nonzero(touched, size=bcap, fill_value=nblocks)
            arena = jnp.concatenate([wb, jnp.zeros((1, B), jnp.int32)])[bi]
            (j,) = jnp.nonzero(arena.reshape(-1) != 0, size=cap, fill_value=0)
            gi = bi[j // B].astype(jnp.int32) * B + (j % B).astype(jnp.int32)
            vals = arena.reshape(-1)[j]
            return jnp.concatenate(
                [jnp.stack([gi, vals]), jnp.stack([n, nb]).reshape(2, 1)], axis=1
            )

        return run

    for n_cand in (10_000, 90_000, 300_000):
        flat = np.zeros(nwords, dtype=np.int32)
        pos = rng.choice(nwords, size=n_cand, replace=False)
        flat[pos] = 1 << 3
        flat_dev = jax.device_put(jnp.asarray(flat))
        jax.block_until_ready(flat_dev)
        cap = 1 << int(np.ceil(np.log2(n_cand + 64)))
        bcap = min(cap, nwords // 512 + 1)
        fn = compact_fn(cap, bcap)
        out = jax.block_until_ready(fn(flat_dev))  # compile
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            wwn = np.asarray(fn(flat_dev))
            best = min(best, time.perf_counter() - t0)
        n_got = int(wwn[0, -1])
        log(
            f"compact+fetch n_cand={n_cand} (cap {cap}): {best*1e3:6.2f} ms"
            f"  fetched {wwn.nbytes/1e6:.2f} MB  n={n_got}"
        )

    for nbytes in (128 << 10, 512 << 10, 2 << 20, 8 << 20):
        arr = jax.device_put(jnp.zeros(nbytes // 4, jnp.int32))
        jax.block_until_ready(arr)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            _ = np.asarray(arr)
            best = min(best, time.perf_counter() - t0)
        log(f"d2h {nbytes>>10:6d} KiB: {best*1e3:6.2f} ms = {nbytes/best/1e6:8.1f} MB/s")

    # --- 4. native replay rate (verify upper bound) ----------------------
    try:
        from alfred_margaret_tpu.models import ac
        from alfred_margaret_tpu.ops.pallas_scan import states_at_positions

        m100 = ac.build([(n, i) for i, n in enumerate(needles100)])
        for n_pos in (30_000, 100_000, 300_000):
            pos = np.sort(rng.integers(16, len(data), size=n_pos)).astype(np.int64)
            t0 = time.perf_counter()
            st = states_at_positions(m100, data, pos)
            dt = time.perf_counter() - t0
            log(
                f"states_at {n_pos} pos (W={m100.max_needle_bytes}): "
                f"{dt*1e3:6.2f} ms = {n_pos/dt/1e6:.2f} M pos/s"
            )
    except Exception as e:
        log(f"native replay unavailable: {e}")


if __name__ == "__main__":
    main()
