"""Stride-2 candidate filter: the hit-sparse ``containsAny`` fast path.

Mid-tier machines (~100 needles) answer ``containsAny`` with the comb16
sticky scan at ~165/g GB/s (g ~ 6).  This module screens the corpus first
with a shift-AND register automaton over PAIR symbols — one step per TWO
bytes, tables indexed by the 7-bit nibble hash ``((b1 & 15) << 3) |
(b2 & 7)`` so each word costs ONE single-row gather per pair-step
(0.5 gathers/byte; measured ~150-330 GB/s at V <= 4,
experiments/tpu_filter_probe.py):

* needles <= 3 bytes run EXACTLY via rolling-window ALU compares (no
  gathers; their sticky plane answers True outright);
* needles >= 4 bytes become union buckets of right-aligned alignment
  chains with shared end bits; end-bit fires are *candidates* (nibble
  collisions + union mixing give false positives), so a candidate-only
  verdict falls back to the exact sticky scan.

The payoff is the common serving case (blocklists, brand/profanity
screens) where most corpora contain NO match: the filter answers False at
~5-10x the comb16 sticky rate with zero fallbacks; a hit costs at most
one extra screening pass (~1/10 of the exact scan).  Counts never use
this path — exact counting is enumeration-bound on this hardware, the
measured-dead analysis lives in docs/SERVING.md ("Why the mid-tier
bucketed prefilter+verify pipeline does NOT beat comb16").

Correctness contract: the candidate plane is a SUPERSET of true match
ends for the long needles (chains constrain byte nibbles only and every
alignment is tracked; registers freeze past each stream's valid end so
right-padding cannot erase a pending fire, and warm-up replay bytes are
real corpus bytes).  Exactness of the final verdict therefore rests on
the exact fallback, never on the filter.

Reference semantics mirrored: ``containsAny``'s ``Done True`` early-exit
fold (``src/Data/Text/AhoCorasick/Searcher.hs:156-164``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

#: Union-bucket size: half-pair boundary constraints carry 16 entries per
#: needle over the 128-entry tables, so k needles/bucket put the chain
#: boundaries at density k/8..k/16 — k ~ 5 keeps screening useful while a
#: word still covers ~5-6 buckets (measured fire rates: 19/bucket -> 10.8%
#: of pairs, 5/bucket -> ~1.5%, experiments/logs/tpu_filter_probe.log).
BUCKET_K = 5

#: Rolling-window compare budget: each short needle costs ~4-6 vector ops
#: per pair-step; past this the ALU issue cost rivals a gather.
MAX_SHORTS = 8

#: Usable track bits per word (bit 31 = int32 sign stays clear).
WORD_BITS = 31


@dataclass(frozen=True)
class FilterWord:
    seed: int
    endmask: int
    btab: np.ndarray  # int64 [128] pair-hash -> track mask


@dataclass(frozen=True)
class FilterLayout:
    """Sticky filter plan: V candidate pair-words + K exact short compares."""

    words: Tuple[FilterWord, ...]
    #: (mask, const) int32 pairs for the rolling-window compares, one per
    #: short needle (<= 4 bytes, big-endian packed).
    shorts: Tuple[Tuple[int, int], ...]

    @property
    def n_words(self) -> int:
        return len(self.words)


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _chains(nd: bytes) -> List[List[Tuple[Optional[int], Optional[int]]]]:
    """Even/odd alignment chains as (b1, b2) pair constraints; None =
    wildcard half (chain boundaries where the needle covers only one byte
    of the pair)."""
    L = len(nd)
    ev = []
    i = 0
    while i < L:
        ev.append((nd[i], nd[i + 1] if i + 1 < L else None))
        i += 2
    od: List[Tuple[Optional[int], Optional[int]]] = [(None, nd[0])]
    i = 1
    while i < L:
        od.append((nd[i], nd[i + 1] if i + 1 < L else None))
        i += 2
    return [ev, od]


def _entries(con) -> List[int]:
    b1, b2 = con
    his = range(16) if b1 is None else [b1 & 15]
    los = range(8) if b2 is None else [b2 & 7]
    return [(h << 3) | l for h in his for l in los]


def plan_filter(machine, max_words: int = 3) -> Optional[FilterLayout]:
    """Sticky-filter layout for ``machine``'s needles, or None.

    Eligible: CaseSensitive byte semantics (composed-CI machines would
    need byte-class chains — not built), no empty needle, no NUL byte,
    at most :data:`MAX_SHORTS` needles under 4 bytes, and the chain
    buckets (needles >= 4 bytes) fitting ``max_words`` words.  Machines
    whose exact bitap plan exists never get here (the dispatcher prefers
    exact kernels)."""
    if getattr(machine, "composed_ci", False):
        return None
    needles = [bytes(nd) for nd in getattr(machine, "needles", [])]
    if not needles:
        return None
    shorts: List[Tuple[int, int]] = []
    longs: List[bytes] = []
    for nd in set(needles):
        if len(nd) == 0 or 0 in nd:
            return None
        if len(nd) <= 3:
            # <= 3 bytes: a pair chain would carry a half-pair at BOTH
            # boundaries (density k/8 * k/16 — all fire, no screen), so
            # these run as exact rolling compares instead.
            const = 0
            for x in nd:
                const = (const << 8) | x
            shorts.append((_i32((1 << (8 * len(nd))) - 1), _i32(const)))
        else:
            longs.append(nd)
    if len(shorts) > MAX_SHORTS:
        return None
    longs.sort(key=lambda n: (len(n), n))
    # Bucket size adapts upward for big sets (more union density, but the
    # alternative for them is G sticky passes at single-digit GB/s).
    for k in (BUCKET_K, 7, 10, 14):
        lay = _pack(longs, shorts, k, max_words)
        if lay is not None:
            return lay
    return None


def _pack(longs, shorts, bucket_k: int, max_words: int) -> Optional[FilterLayout]:
    words: List[FilterWord] = []
    seed = endmask = 0
    btab = np.zeros(128, dtype=np.int64)
    off = 0
    i = 0
    while i < len(longs):
        bucket = longs[i : i + bucket_k]
        chains = []
        for nd in bucket:
            chains += _chains(nd)
        W = max(len(c) for c in chains)
        if off + W > WORD_BITS:
            words.append(FilterWord(seed, endmask, btab))
            seed = endmask = 0
            btab = np.zeros(128, dtype=np.int64)
            off = 0
            if len(words) >= max_words:
                return None
            if W > WORD_BITS:
                return None  # absurd single needle (> ~60 bytes)
        end = off + W - 1
        for c in chains:
            start = end - len(c) + 1
            seed |= 1 << start
            for p, con in enumerate(c):
                for e in _entries(con):
                    btab[e] |= 1 << (start + p)
        endmask |= 1 << end
        off = end + 1
        i += bucket_k
    if off:
        words.append(FilterWord(seed, endmask, btab))
    if len(words) > max_words:
        return None
    if not words and not shorts:
        return None
    return FilterLayout(words=tuple(words), shorts=tuple(shorts))


def make_filter_contains_kernel(T_TILE: int, R: int, n_tiles: int, lay: FilterLayout):
    """Sticky screening kernel: OR short-needle exact hits into plane 0 and
    candidate end-bit fires into plane 1 (output ``[2, R, 128]``).

    Boundary tiles freeze the D registers and the rolling window past each
    stream's valid end so right-padding can neither fire nor erase a
    pending fire; interior tiles run unmasked (pads only exist past the
    minimum valid end, which the bscal freeze boundary covers).  Warm-up
    replay bytes are real corpus bytes, so warm fires are genuine."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    V = lay.n_words
    shorts = lay.shorts
    n_pairs = T_TILE // 2

    def kernel(bscal_ref, btab_ref, vend_ref, streams_ref, out_ref,
               d_scr, roll_scr, hit_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            if V:
                d_scr[:] = jnp.zeros((max(V, 1), R, 128), jnp.int32)
            roll_scr[:] = jnp.zeros((R, 128), jnp.int32)
            hit_scr[:] = jnp.zeros((2, R, 128), jnp.int32)

        rows = [
            jax.lax.broadcast_in_dim(btab_ref[v], (R, 128), (1,))
            for v in range(V)
        ]
        vend = vend_ref[:]
        t0 = tile * T_TILE

        def make_body(masked):
            def body(u, carry):
                D = list(carry[:V])
                roll, exact, cand = carry[V], carry[V + 1], carry[V + 2]
                for j in range(8):
                    t = (u * 8 + j) * 2
                    b1 = streams_ref[t].astype(jnp.int32)
                    b2 = streams_ref[t + 1].astype(jnp.int32)
                    if masked:
                        # Freeze once b1 leaves the valid region: a match
                        # can still END at the last valid byte (b1) via the
                        # wildcard end-half entries, so the cut is at b1.
                        adv = (t0 + t) < vend
                    if V:
                        idx = ((b1 & 15) << 3) | (b2 & 7)
                        for v in range(V):
                            B = jnp.take_along_axis(rows[v], idx, axis=1)
                            wl = lay.words[v]
                            nd = ((D[v] << 1) | jnp.int32(wl.seed)) & B
                            D[v] = jnp.where(adv, nd, D[v]) if masked else nd
                            cand = cand | (D[v] & jnp.int32(wl.endmask))
                    if shorts:
                        nroll = ((roll << 8) | b1) << 8 | b2
                        roll = jnp.where(adv, nroll, roll) if masked else nroll
                        inc = None
                        for mask, const in shorts:
                            for rr in (roll, roll >> 8):
                                c = jnp.where(
                                    (rr & jnp.int32(mask)) == jnp.int32(const),
                                    1, 0,
                                )
                                inc = c if inc is None else inc | c
                        exact = exact | inc
                return (*D, roll, exact, cand)

            return body

        carry0 = tuple(d_scr[v] for v in range(V)) + (
            roll_scr[:], hit_scr[0], hit_scr[1]
        )
        is_boundary = t0 + T_TILE > bscal_ref[1]
        out = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, n_pairs // 8, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, n_pairs // 8, make_body(False), c),
            carry0,
        )
        for v in range(V):
            d_scr[v] = out[v]
        roll_scr[:] = out[V]
        hit_scr[0] = out[V + 1]
        hit_scr[1] = out[V + 2]

        @pl.when(tile == n_tiles - 1)
        def _fin():
            out_ref[:] = hit_scr[:]

    return kernel


def attach_filter(engine, machine, max_words: int = 3) -> bool:
    """Plan and attach the sticky filter to a Pallas-family engine; the
    engine's ``contains_staged`` consults :func:`filter_contains` first.
    Returns True when attached.  AMT_FILTER=0 disables."""
    import os

    if os.environ.get("AMT_FILTER") == "0":
        engine._filter_lay = None
        return False
    if engine.t_tile % 16:
        engine._filter_lay = None
        return False
    lay = plan_filter(machine, max_words=max_words)
    engine._filter_lay = lay
    if lay is None:
        return False
    import jax.numpy as jnp

    bt = np.stack([w.btab for w in lay.words]) if lay.words else np.zeros(
        (1, 128), dtype=np.int64
    )
    if (bt >> 31 != 0).any():  # pragma: no cover - planner invariant
        # A track bit reached the int32 sign bit (would corrupt the cast
        # below and make False verdicts unsound).  Never happens under
        # WORD_BITS=31; disable rather than assert so python -O stays safe.
        engine._filter_lay = None
        return False
    engine._filter_btab = jnp.asarray(bt.astype(np.int32))
    engine._filter_fns = {}
    engine._filter_strikes = 0
    return True


def _strict_bscal(st):
    """Freeze-boundary scalars for the filter: pads are NOT inert for the
    pair chains even when the exact machine's are, so the staged corpus's
    no-freeze sentinel must be replaced by the true min valid end."""
    import jax.numpy as jnp

    from .pallas_scan import _boundary_scalars

    if st._bscal_strict is None:
        vend = np.asarray(st.vend_t).reshape(-1)
        st._bscal_strict = jnp.asarray(
            _boundary_scalars(st.warm_np, vend, False)
        )
    return st._bscal_strict


#: Self-disable budget: union chains over same-alphabet text fire
#: SOMEWHERE in any large corpus, so screening such workloads would be
#: pure overhead.  After this many consecutive useless screens (candidate
#: fire -> exact fallback anyway) the engine stops consulting the filter;
#: a definite verdict resets the count.  Alphabet-disjoint workloads
#: (binary logs vs text blocklists and the like) therefore keep the
#: 5-10x screen automatically while text-on-text workloads pay at most
#: FILTER_STRIKES wasted screening passes per engine lifetime.
FILTER_STRIKES = 3


def filter_contains(engine, st) -> Optional[bool]:
    """Screen a staged corpus: True (exact short-needle hit), False (no
    fire anywhere), or None (candidate fires or the filter self-disabled —
    the caller must run the exact sticky scan)."""
    lay = getattr(engine, "_filter_lay", None)
    if lay is None:
        return None
    if engine._filter_strikes >= FILTER_STRIKES:
        return None  # self-disabled for this workload
    import jax

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    T = st.plan.time_len
    key = T
    if key not in engine._filter_fns:
        R, t_tile = engine.R, engine.t_tile
        n_tiles = T // t_tile
        V = lay.n_words
        kernel = make_filter_contains_kernel(t_tile, R, n_tiles, lay)
        rc = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

        @jax.jit
        def run(bscal, btab, vend, streams_u8):
            streams = streams_u8.reshape(T, R, 128)
            return pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (max(V, 1), 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    rc,
                    pl.BlockSpec(
                        (t_tile, R, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((max(V, 1), R, 128), jnp.int32),
                    pltpu.VMEM((R, 128), jnp.int32),
                    pltpu.VMEM((2, R, 128), jnp.int32),
                ],
                interpret=engine.interpret,
            )(bscal, btab, vend, streams)

        engine._filter_fns[key] = run
    out = np.asarray(
        engine._filter_fns[key](
            _strict_bscal(st), engine._filter_btab, st.vend_t, st.streams_dev
        )
    )
    if st.live_np is not None:
        out = out[:, st.live_np]
    if (out[0] != 0).any():
        engine._filter_strikes = 0
        return True  # exact short-needle hit
    if (out[1] != 0).any():
        engine._filter_strikes += 1
        return None  # candidates: exact fallback decides
    engine._filter_strikes = 0
    return False


__all__ = [
    "FilterLayout",
    "attach_filter",
    "filter_contains",
    "plan_filter",
]
