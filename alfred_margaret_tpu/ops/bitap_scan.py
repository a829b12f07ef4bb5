"""Bitap (shift-AND) Pallas kernel: the fast path for small needle sets.

The dense DFA kernel (``ops.pallas_scan``) is capped at the measured
*dependent*-gather floor (~165 GB/s on v5e): its per-byte transition gather
feeds the state carry, so gathers serialize.  A bitap register automaton
keeps the carry in pure ALU:

    D   = ((D << 1) | SEED) & B[byte]     # 3 dependent vector ops
    blk += D & ENDMASK                    # per-needle count fields

with one bit track per (unique) needle inside an int32 lane, so the only
gather — the 256-entry ``B`` mask lookup — depends on the *input byte
only* and pipelines freely.  Measured on v5e (experiments/tpu_bitap_probe):
**639 GB/s** exact counts vs 177 GB/s for the dense kernel on the same
corpus (~78% of the ~820 GB/s HBM roof).

Semantics: every needle's track fires independently wherever that needle
ends, so overlapping matches, needles that are suffixes of other needles,
and duplicate needles (via per-field multiplicity weights) all count
exactly as the reference's flattened output sets do
(``AhoCorasick/Automaton.hs:367-380``).  Match *positions* still go through
the dense kernels — ``BitapAcEngine`` subclasses ``PallasAcEngine`` and
overrides only ``count_staged`` / ``contains_staged``.

Eligibility (``plan_bitap``): CaseSensitive byte semantics (not a composed
case-folding DFA — its ``needles`` are original-case), no empty needle, no
NUL byte in any needle (pad bytes must kill the register), and the track
layout must fit 30 bits (bit 31 = int32 sign; each count field needs
headroom for a flush block of ``2**min_head - 1`` bytes).

IgnoreCase (``plan_bitap_ci``): shift-AND matches *byte-class* strings
natively — each track position holds a SET of accepted bytes (the union of
the same-length unlowerings of the needle code point's encoding, e.g.
``{0x61, 0x41}`` for ``a``), so the composed case-folding regime
(``models.case_dfa``: IgnoreCase on RAW bytes, no host lowering pass) runs
at full bitap rate.  Exactness is a plan-time *closure gate* (every
cartesian-product byte string must decode to a preimage of the needle code
point — rejects e.g. Greek ``ω`` whose variant mix ``0xCF 0xA9`` decodes to
a different letter) plus a runtime *trap word*: the 25 length-changing
unlowerings in Unicode (İ→i, K→k, Å→å, ẞ→ß, Ɫ/Ɑ/…) cannot occupy a
fixed-width track, so their encodings are tracked by one extra sticky
register and any occurrence in the corpus falls the scan back to the
composed dense kernel.  Real corpora contain none, so the guard is one
extra independent gather per byte and the fallback never fires.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ac import AcMachine
from ..models.byteclass import ci_track_key, ci_tracks
from .pallas_scan import PallasAcEngine, StagedStreams, _broadcast_rows

#: Track budget: bit 31 must stay clear (int32 sign would corrupt compares
#: and the arithmetic-shift field extraction), and the last count field
#: accumulates toward bit 30.
MAX_TRACK_BITS = 30


@dataclass(frozen=True)
class WordLayout:
    """Track layout for ONE int32 bitap register (word)."""

    seed: int  # bit per track start, injected every step
    endmask: int  # bit per track end (match flag)
    btab: np.ndarray  # int64 [256] byte -> track mask
    #: per track: (end_bit, headroom_bits, multiplicity_weight)
    fields: Tuple[Tuple[int, int, int], ...]
    #: per track: canonical needle key (CS: the needle bytes; CI: the
    #: lowered-needle bytes), aligned with ``fields``
    keys: Tuple[bytes, ...] = ()
    #: end bits of EMBEDDED trap tracks riding this word's register in the
    #: spare bits above the last count field's flush headroom — trap
    #: detection then costs zero extra gathers (only the fold fast-path,
    #: when the trap bytes are non-ASCII).  Their seed/btab bits are
    #: already merged into ``seed``/``btab``; they are absent from
    #: ``fields`` so counts never see them.
    trap_endmask: int = 0

    @property
    def fold(self) -> bool:
        """True when bytes >= 127 share one mask (ASCII needles): the B
        lookup is one ``min`` + one row gather instead of 2 rows + select."""
        return bool((self.btab[127:] == self.btab[127]).all())


@dataclass(frozen=True)
class BitapLayout:
    """Multi-word track layout: needles bin-packed into ``V`` int32
    registers per stream.  Per byte the kernel does V independent B
    gathers + 3V dependent ALU ops, so throughput degrades ~linearly in V
    (measured V=1: 639 GB/s on v5e); ``plan_bitap`` caps V where the dense
    ladder wins instead."""

    words: Tuple[WordLayout, ...]
    unroll: int  # flush block size (2**min_headroom > unroll, every field)
    #: IgnoreCase trap register: sticky tracks for the length-changing
    #: unlowering encodings excluded from the byte-class tracks; a hit
    #: means the bitap result may under-count and the caller must fall
    #: back to the composed dense kernel.  None = tracks are exact alone.
    trap: Optional[WordLayout] = None
    #: True for byte-class (composed IgnoreCase) layouts.
    ci: bool = False

    @property
    def n_words(self) -> int:
        return len(self.words)

    @property
    def has_trap(self) -> bool:
        """True when ANY trap tracks exist (embedded in match words or in
        the standalone trap register): the kernels then emit the sticky
        trap plane and callers must honor the fallback contract."""
        return self.trap is not None or any(w.trap_endmask for w in self.words)

    def all_words(self) -> Tuple[WordLayout, ...]:
        """Match words + the trap word (if any), in kernel B-table order."""
        return self.words + ((self.trap,) if self.trap is not None else ())


#: A track: per-position accepted byte sets, a count weight, and the
#: canonical needle key.  CS needles are singleton-set tracks.
_Track = Tuple[Tuple[Tuple[int, ...], ...], int, bytes]


def _pack_words(tracks: Sequence[_Track], min_head: int):
    """Greedy sequential packing of ascending-length tracks into 30-bit
    words (tracks never span words; the shortest track of each word goes
    first so later tracks' lengths double as count-field headroom)."""
    words = []
    i = 0
    while i < len(tracks):
        seed = 0
        endmask = 0
        btab = np.zeros(256, dtype=np.int64)
        fields = []
        keys = []
        off = 0
        took = 0
        while i < len(tracks):
            possets, weight, key = tracks[i]
            tlen = len(possets)
            end = off + tlen - 1
            # A track may turn out to be the last in its word, so it must
            # leave min_head bits of final headroom; close the word early
            # and spill to the next one otherwise.
            if MAX_TRACK_BITS - end < min_head:
                break
            # Tentative: the field needs headroom to the NEXT track in this
            # word, or to bit 30 if it ends the word.  Place it, fix the
            # previous field's recorded headroom.
            seed |= 1 << off
            for pp, bset in enumerate(possets):
                for b in bset:
                    btab[b] |= 1 << (off + pp)
            endmask |= 1 << end
            fields.append([end, MAX_TRACK_BITS - end, weight])
            keys.append(key)
            if len(fields) > 1:
                fields[-2][1] = end - fields[-2][0]
            took += 1
            i += 1
            if i < len(tracks):
                nlen = len(tracks[i][0])
                head = max(nlen, min_head)
                off = end + 1 + (head - nlen)  # guard bits
        if took == 0:
            return None  # single track longer than a word
        assert all(h >= min_head for _, h, _ in fields)
        words.append(
            WordLayout(
                seed=seed,
                endmask=endmask,
                btab=btab,
                fields=tuple((e, h, w) for e, h, w in fields),
                keys=tuple(keys),
            )
        )
    return tuple(words)


def _plan_tracks(
    tracks: Sequence[_Track],
    max_unroll: int,
    max_words: int,
    trap: Optional[WordLayout] = None,
    ci: bool = False,
) -> Optional[BitapLayout]:
    """Shared packing loop: the largest flush block (power of two <=
    ``max_unroll``) that every count field can absorb without carry
    overflow; None when even single-byte flush blocks cannot fit."""
    if sum(len(t[0]) for t in tracks) > max_words * MAX_TRACK_BITS:
        return None
    tracks = sorted(tracks, key=lambda t: len(t[0]))
    unroll = max_unroll
    while unroll >= 1:
        min_head = max(1, int(unroll).bit_length())  # unroll < 2**min_head
        words = _pack_words(tracks, min_head)
        if words is not None and len(words) <= max_words:
            return BitapLayout(words=words, unroll=unroll, trap=trap, ci=ci)
        unroll //= 2
    return None


def plan_bitap(
    machine: AcMachine, max_unroll: int = 8, max_words: int = 3
) -> Optional[BitapLayout]:
    """Track layout for ``machine``'s needles, or None if ineligible.

    Unique needles get one track each (duplicates fold into the field's
    multiplicity weight), bin-packed into at most ``max_words`` int32
    registers.
    """
    if getattr(machine, "composed_ci", False):
        return None
    if not machine.needles:
        return None
    mult: Dict[bytes, int] = {}
    for nd in machine.needles:
        if len(nd) == 0 or 0 in nd:
            return None  # empty needle (root piggyback) / NUL (pad bytes)
        mult[bytes(nd)] = mult.get(bytes(nd), 0) + 1
    tracks = [
        (tuple((b,) for b in nd), w, nd) for nd, w in mult.items()
    ]
    return _plan_tracks(tracks, max_unroll, max_words)


def plan_bitap_ci(
    machine: AcMachine, max_unroll: int = 8, max_words: int = 3
) -> Optional[BitapLayout]:
    """Byte-class track layout for a composed case-folding DFA, or None.

    One track per unique *lowered* needle (original-case duplicates fold
    into the multiplicity weight: ``Foo`` and ``foo`` are the same CI
    emission stream, matching the composed DFA's per-state counts); each
    track position accepts the union of that code point's same-length
    unlowering bytes, with the closure gate of :func:`_ci_cp_sets`.
    Length-changing unlowerings pack into the sticky trap word.
    """
    got = ci_tracks(machine)
    if got is None:
        return None
    tracks, trap_list = got

    lay0 = _plan_tracks(tracks, max_unroll, max_words, ci=True)
    if lay0 is None or not trap_list:
        return lay0

    # Embed trap tracks into the spare trailing bits of the match words
    # (above each last field's flush headroom): detection then rides the
    # SAME register — zero extra gathers, vs a full B-gather per byte for
    # the standalone trap word (measured 73 vs ~110+ GB/s at V=1).  Trap
    # end bits live in `trap_endmask`, never in `fields`, so counts are
    # untouched; back-to-back placement is safe for the same reason match
    # tracks pack tightly (the seed re-injects the start bit every step,
    # so a neighbor's leaked carry bit is indistinguishable from the
    # seed).  Whatever does not fit spills to the standalone register.
    min_head = max(1, int(lay0.unroll).bit_length())
    remaining = sorted(trap_list, key=len)
    new_words = []
    for wl in lay0.words:
        seed, btab, tem = wl.seed, wl.btab.copy(), 0
        off = max(e for e, _, _ in wl.fields) + min_head
        still = []
        for enc in remaining:
            if off + len(enc) - 1 <= MAX_TRACK_BITS - 1:
                seed |= 1 << off
                for p, b in enumerate(enc):
                    btab[b] |= 1 << (off + p)
                tem |= 1 << (off + len(enc) - 1)
                off += len(enc)
            else:
                still.append(enc)
        remaining = still
        new_words.append(
            WordLayout(
                seed=seed,
                endmask=wl.endmask,
                btab=btab,
                fields=wl.fields,
                keys=wl.keys,
                trap_endmask=tem,
            )
        )
    trap = None
    if remaining:
        packed = _pack_words(
            [(tuple((b,) for b in e), 0, e) for e in remaining], 1
        )
        if packed is None or len(packed) != 1:
            return None  # absurd needle set: too many distinct trap letters
        trap = packed[0]
    return BitapLayout(
        words=tuple(new_words), unroll=lay0.unroll, trap=trap, ci=True
    )


#: Max distinct nonzero high-half B entries served by the compare-select
#: chain instead of a second row gather (the embedded-trap case: a couple
#: of non-ASCII trap bytes inside an otherwise-ASCII word).
HI_PAIR_MAX = 8


def _hi_pairs(btab: np.ndarray):
    """[(byte, mask)] for a sparse high half, or None.

    Eligible when ``btab[127] == 0`` (so the low-row gather covers bytes
    0..127 exactly) and at most ``HI_PAIR_MAX`` bytes >= 128 have nonzero
    masks: the kernel then computes the high-half mask as a short
    compare-select chain — one gather total, where the 2-row path costs
    two gathers + a select."""
    if btab[127] != 0:
        return None
    nz = [(b, int(btab[b])) for b in range(128, 256) if btab[b]]
    if not nz or len(nz) > HI_PAIR_MAX:
        return None
    return tuple(nz)


def _b_of(byte_rc, b_rows, fold: bool, hi_pairs=None):
    """byte -> int32 track mask via the 256-entry B table ([2,128] rows).

    The gather depends on the input byte only — it never touches the D
    carry chain, which is what lets this loop run past the dense kernel's
    dependent-gather floor.  Three static modes: ``fold`` (high half all
    equal — one min + one gather), ``hi_pairs`` (sparse high half — one
    gather + a compare-select chain), 2-row (two gathers + select)."""
    if fold:
        return jnp.take_along_axis(b_rows[0], jnp.minimum(byte_rc, 127), axis=1)
    blo = byte_rc & 127
    m0 = jnp.take_along_axis(b_rows[0], blo, axis=1)
    if hi_pairs is not None:
        m1 = None
        for bv, mask in hi_pairs:
            hit = jnp.where(byte_rc == bv, jnp.int32(mask), 0)
            m1 = hit if m1 is None else m1 | hit
        return jnp.where(byte_rc < 128, m0, m1)
    m1 = jnp.take_along_axis(b_rows[1], blo, axis=1)
    return jnp.where(byte_rc < 128, m0, m1)


def _make_bitap_count_kernel(
    T_TILE: int,
    R: int,
    n_tiles: int,
    reps: int,
    lay: BitapLayout,
):
    """Count kernel over a ``n_tiles * reps`` grid (same stream/rep/boundary
    protocol as ``pallas_scan._make_count_kernel``), generalized to V bitap
    registers per stream (V independent B gathers + 3V dependent ALU ops
    per byte).

    Masking: eligibility guarantees ``B[0] == 0``, so the first right-pad
    byte zeroes every register and pads can never flag a match — only the
    warm-up boundary needs masking (matches ending in a stream's warm-up
    replay are owned by the previous stream), so interior tiles run the
    unmasked body.

    Trap layouts (IgnoreCase) carry one extra register + an extra sticky
    scratch and emit a second ``[R, 128]`` output of trap flags; the
    caller must fall back to the dense kernel when any flag is set.
    """
    n_grid = n_tiles * reps
    unroll = lay.unroll
    V = lay.n_words
    trap = lay.trap
    has_trap = lay.has_trap
    VT = V + (1 if trap is not None else 0)

    def kernel(bscal_ref, btab_ref, warm_ref, streams_ref, *refs):
        if has_trap:
            out_ref, trap_ref, d_scr, cnt_scr, trap_scr = refs
        else:
            out_ref, d_scr, cnt_scr = refs
            trap_ref = trap_scr = None
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((VT, R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_cnt():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)
            if has_trap:
                trap_scr[:] = jnp.zeros((R, 128), jnp.int32)

        b_rows = _broadcast_rows(btab_ref[:], 2 * VT, R)
        warm = warm_ref[:]
        t0 = tmod * T_TILE
        hp = [_hi_pairs(wl.btab) if not wl.fold else None for wl in lay.all_words()]

        def make_body(masked):
            def body(u, carry):
                if has_trap:
                    *D, counts, tr = carry
                else:
                    *D, counts = carry
                    tr = None
                D = list(D)
                blk = [None] * V
                for j in range(unroll):
                    t = u * unroll + j
                    byte = streams_ref[t].astype(jnp.int32)
                    for w, wl in enumerate(lay.words):
                        B = _b_of(byte, b_rows[2 * w : 2 * w + 2], wl.fold, hp[w])
                        D[w] = ((D[w] << 1) | jnp.int32(int(wl.seed))) & B
                        e = D[w] & jnp.int32(int(wl.endmask))
                        if masked:
                            e = jnp.where(t0 + t >= warm, e, 0)
                        blk[w] = e if blk[w] is None else blk[w] + e
                        if wl.trap_endmask:
                            tr = tr | (D[w] & jnp.int32(int(wl.trap_endmask)))
                    if trap is not None:
                        B = _b_of(byte, b_rows[2 * V : 2 * V + 2], trap.fold, hp[V])
                        D[V] = ((D[V] << 1) | jnp.int32(int(trap.seed))) & B
                        tr = tr | (D[V] & jnp.int32(int(trap.endmask)))
                for w, wl in enumerate(lay.words):
                    for eb, h, wt in wl.fields:
                        f = (blk[w] >> eb) & jnp.int32((1 << h) - 1)
                        counts = counts + (f * jnp.int32(wt) if wt != 1 else f)
                return (*D, counts, tr) if has_trap else (*D, counts)

            return body

        is_boundary = t0 < bscal_ref[0]
        carry0 = (*(d_scr[w] for w in range(VT)), cnt_scr[:])
        if has_trap:
            carry0 = (*carry0, trap_scr[:])
        out = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            carry0,
        )
        if has_trap:
            *D, counts, tr = out
            trap_scr[:] = tr
        else:
            *D, counts = out
        for w in range(VT):
            d_scr[w] = D[w]
        cnt_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = cnt_scr[:]
            if has_trap:
                trap_ref[:] = trap_scr[:]

    return kernel


def _make_bitap_contains_kernel(
    T_TILE: int,
    R: int,
    n_tiles: int,
    reps: int,
    lay: BitapLayout,
):
    """Sticky existence kernel: OR the end bits of every word into one hit
    register; no masking at all (warm-up bytes replay real corpus bytes, so
    a match there is a genuine match, and pads zero the registers —
    mirrors the dense sticky kernel's warm-free design).  Trap layouts emit
    a second sticky trap output (see the count kernel)."""
    n_grid = n_tiles * reps
    unroll = lay.unroll
    V = lay.n_words
    trap = lay.trap
    has_trap = lay.has_trap
    VT = V + (1 if trap is not None else 0)

    def kernel(btab_ref, streams_ref, *refs):
        if has_trap:
            out_ref, trap_ref, d_scr, hit_scr, trap_scr = refs
        else:
            out_ref, d_scr, hit_scr = refs
            trap_ref = trap_scr = None
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((VT, R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_hits():
            hit_scr[:] = jnp.zeros((R, 128), jnp.int32)
            if has_trap:
                trap_scr[:] = jnp.zeros((R, 128), jnp.int32)

        b_rows = _broadcast_rows(btab_ref[:], 2 * VT, R)
        hp = [_hi_pairs(wl.btab) if not wl.fold else None for wl in lay.all_words()]

        def body(u, carry):
            if has_trap:
                *D, hits, tr = carry
            else:
                *D, hits = carry
                tr = None
            D = list(D)
            for j in range(unroll):
                t = u * unroll + j
                byte = streams_ref[t].astype(jnp.int32)
                for w, wl in enumerate(lay.words):
                    B = _b_of(byte, b_rows[2 * w : 2 * w + 2], wl.fold, hp[w])
                    D[w] = ((D[w] << 1) | jnp.int32(int(wl.seed))) & B
                    hits = hits | (D[w] & jnp.int32(int(wl.endmask)))
                    if wl.trap_endmask:
                        tr = tr | (D[w] & jnp.int32(int(wl.trap_endmask)))
                if trap is not None:
                    B = _b_of(byte, b_rows[2 * V : 2 * V + 2], trap.fold, hp[V])
                    D[V] = ((D[V] << 1) | jnp.int32(int(trap.seed))) & B
                    tr = tr | (D[V] & jnp.int32(int(trap.endmask)))
            return (*D, hits, tr) if has_trap else (*D, hits)

        carry0 = (*(d_scr[w] for w in range(VT)), hit_scr[:])
        if has_trap:
            carry0 = (*carry0, trap_scr[:])
        out = jax.lax.fori_loop(0, T_TILE // unroll, body, carry0)
        if has_trap:
            *D, hits, tr = out
            trap_scr[:] = tr
        else:
            *D, hits = out
        for w in range(VT):
            d_scr[w] = D[w]
        hit_scr[:] = hits

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = hit_scr[:]
            if has_trap:
                trap_ref[:] = trap_scr[:]

    return kernel


def _make_bitap_presence_kernel(
    T_TILE: int,
    R: int,
    n_tiles: int,
    reps: int,
    lay: BitapLayout,
):
    """Per-WORD sticky end-bit kernel: like the contains kernel but keeps
    one ``[R, 128]`` sticky register per word (output ``[V, R, 128]``), so
    every track's end bit survives as a per-needle presence flag even in
    multi-word layouts (words share bit positions, so a single OR would
    alias tracks across words).  Trap layouts append a trap plane as
    output row V."""
    n_grid = n_tiles * reps
    unroll = lay.unroll
    V = lay.n_words
    trap = lay.trap
    VT = V + (1 if trap is not None else 0)

    def kernel(btab_ref, streams_ref, out_ref, d_scr, hit_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((VT, R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_hits():
            hit_scr[:] = jnp.zeros((VT, R, 128), jnp.int32)

        b_rows = _broadcast_rows(btab_ref[:], 2 * VT, R)
        hp = [_hi_pairs(wl.btab) if not wl.fold else None for wl in lay.all_words()]

        def body(u, carry):
            D = list(carry[:VT])
            H = list(carry[VT:])
            for j in range(unroll):
                t = u * unroll + j
                byte = streams_ref[t].astype(jnp.int32)
                for w, wl in enumerate(lay.all_words()):
                    B = _b_of(byte, b_rows[2 * w : 2 * w + 2], wl.fold, hp[w])
                    D[w] = ((D[w] << 1) | jnp.int32(int(wl.seed))) & B
                    m = int(wl.endmask) | int(wl.trap_endmask)
                    H[w] = H[w] | (D[w] & jnp.int32(m))
            return (*D, *H)

        carry0 = tuple(d_scr[w] for w in range(VT)) + tuple(
            hit_scr[w] for w in range(VT)
        )
        out = jax.lax.fori_loop(0, T_TILE // unroll, body, carry0)
        for w in range(VT):
            d_scr[w] = out[w]
            hit_scr[w] = out[VT + w]

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = hit_scr[:]

    return kernel


def make_host_exact(machine: AcMachine):
    """Host composed-DFA engine for localized trap recovery (C++ when the
    toolchain exists, else None — callers fall back to the scalar scan)."""
    try:
        from ..native.cpp_engine import CppAcEngine

        return CppAcEngine(machine)
    except Exception:
        return None


def host_stream_count(machine, host_eng, data, emit_len, n, warm_s, s) -> int:
    """Exact match count owned by stream ``s`` (ends in its emission
    region), re-derived from the raw corpus bytes: count(window) minus
    count(warm prefix) — every match ending in the warm replay lies
    entirely inside it, so the difference is exactly the matches ending in
    [start, end).  Shared by the single-chip and mesh localized trap
    recovery paths."""
    L = emit_len
    start = s * L
    end = min(start + L, n)
    warm = int(warm_s)
    lo = start - warm
    if host_eng is not None:
        total = host_eng.count(data[lo:end])
        head = host_eng.count(data[lo:start]) if warm else 0
    else:
        from ..models import ac as _ac

        total = _ac.count_matches(machine, data[lo:end])
        head = _ac.count_matches(machine, data[lo:start]) if warm else 0
    return total - head


class BitapAcEngine(PallasAcEngine):
    """``PallasAcEngine`` with bitap count/contains fast paths.

    Everything else (staging, stream plans, state/extraction kernels,
    adopt_staged, bitmap paths) is inherited from the dense engine — the
    dense tables for bitap-eligible machines are tiny, so carrying both
    costs nothing and keeps the full engine surface intact.  For composed
    IgnoreCase machines (``layout.ci``), the inherited dense paths are the
    composed-DFA kernels, which double as the trap-fire fallback.
    """

    def __init__(self, machine: AcMachine, layout: Optional[BitapLayout] = None, **kw):
        super().__init__(machine, **kw)
        lay = layout if layout is not None else plan_bitap(machine)
        if lay is None:
            raise ValueError("machine is not bitap-eligible; use plan_bitap first")
        self.bitap = lay
        wl_all = lay.all_words()
        bt = np.stack([wl.btab for wl in wl_all])  # [VT, 256]
        self._btab_dev = jnp.asarray(
            bt.reshape(2 * len(wl_all), 128).astype(np.int32)
        )
        self._bitap_count = {}
        self._bitap_contains = {}

    def _get_bitap_count_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._bitap_count:
            n_tiles = T // self.t_tile
            lay = self.bitap
            kernel = _make_bitap_count_kernel(
                self.t_tile, self.R, n_tiles, reps, lay
            )
            R, t_tile = self.R, self.t_tile
            VT = len(lay.all_words())
            has_trap = lay.has_trap
            rc_spec = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
            rc_shape = jax.ShapeDtypeStruct((R, 128), jnp.int32)

            @jax.jit
            def run(bscal, btab, warm, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(
                            (2 * VT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        rc_spec,
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=[rc_spec, rc_spec] if has_trap else rc_spec,
                    out_shape=[rc_shape, rc_shape] if has_trap else rc_shape,
                    scratch_shapes=[
                        pltpu.VMEM((VT, R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ]
                    + ([pltpu.VMEM((R, 128), jnp.int32)] if has_trap else []),
                    interpret=self.interpret,
                )(bscal, btab, warm, streams)

            self._bitap_count[key] = run
        return self._bitap_count[key]

    #: Trapped-stream budget for localized recovery: above this fraction of
    #: live streams, one full dense re-scan beats per-stream host loops.
    TRAP_LOCAL_FRAC = 0.01

    def _trapped_streams(self, trap: np.ndarray, st: StagedStreams):
        """Live stream indices whose trap plane fired, or None when the
        full dense re-scan is the cheaper recovery (too many trapped
        streams, or no host copy of the corpus to re-scan from)."""
        flat = trap.reshape(-1) != 0
        if st.live_np is not None:
            flat = flat & st.live_np.reshape(-1)
        idx = np.flatnonzero(flat)
        if len(idx) == 0:
            return idx
        if st.data_np is None:
            return None
        live_n = (
            int(st.live_np.sum()) if st.live_np is not None else st.plan.n_streams
        )
        if len(idx) > max(32, int(live_n * self.TRAP_LOCAL_FRAC)):
            return None
        return idx

    def _host_exact(self):
        """Host engine for per-stream exact recovery (lazy, cached)."""
        if not hasattr(self, "_host_exact_eng"):
            self._host_exact_eng = make_host_exact(self.machine)
        return self._host_exact_eng

    def _host_count_stream(self, st: StagedStreams, s: int) -> int:
        return host_stream_count(
            self.machine,
            self._host_exact(),
            st.data_np,
            st.plan.emit_len,
            st.plan.n,
            st.warm_np[s],
            s,
        )

    def count_staged(self, st: StagedStreams, reps: int = 1) -> int:
        fn = self._get_bitap_count_fn(st.plan.time_len, reps)
        out = fn(self._bscal_for(st), self._btab_dev, st.warm_t, st.streams_dev)
        if self.bitap.has_trap:
            counts, trap = (np.asarray(o) for o in out)
            trapped = self._trapped_streams(trap, st)
            if trapped is None:
                # Dense fallback: too many trapped streams (or no host
                # corpus) — a single composed dense scan is cheaper.
                return super().count_staged(st, reps)
            if len(trapped):
                # Localized recovery: a length-changing unlowering
                # (İ/K/Å/ẞ/…) occurred in a handful of streams; their
                # byte-class counts may under-count.  Re-derive ONLY those
                # streams' counts from the raw corpus on the host (a few
                # KiB each) instead of re-scanning the whole corpus.
                counts = counts.copy().reshape(-1)
                for s in trapped:
                    counts[s] = self._host_count_stream(st, int(s)) * reps
                counts = counts.reshape(trap.shape)
        else:
            counts = np.asarray(out)
        counts = counts.astype(np.int64)
        if st.live_np is not None:
            counts = counts[st.live_np]
        return int(counts.sum())

    def _get_bitap_contains_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._bitap_contains:
            n_tiles = T // self.t_tile
            lay = self.bitap
            kernel = _make_bitap_contains_kernel(
                self.t_tile, self.R, n_tiles, reps, lay
            )
            R, t_tile = self.R, self.t_tile
            VT = len(lay.all_words())
            has_trap = lay.has_trap
            rc_spec = pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
            rc_shape = jax.ShapeDtypeStruct((R, 128), jnp.int32)

            @jax.jit
            def run(btab, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(
                            (2 * VT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=[rc_spec, rc_spec] if has_trap else rc_spec,
                    out_shape=[rc_shape, rc_shape] if has_trap else rc_shape,
                    scratch_shapes=[
                        pltpu.VMEM((VT, R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ]
                    + ([pltpu.VMEM((R, 128), jnp.int32)] if has_trap else []),
                    interpret=self.interpret,
                )(btab, streams)

            self._bitap_contains[key] = run
        return self._bitap_contains[key]

    def contains_staged(self, st: StagedStreams, reps: int = 1) -> bool:
        fn = self._get_bitap_contains_fn(st.plan.time_len, reps)
        out = fn(self._btab_dev, st.streams_dev)
        if self.bitap.has_trap:
            hits, trap = (np.asarray(o) for o in out)
        else:
            hits, trap = np.asarray(out), None
        live_hits = hits[st.live_np] if st.live_np is not None else hits
        if (live_hits != 0).any():
            return True  # a track hit is a genuine match even under traps
        if trap is None:
            return False
        trapped = self._trapped_streams(trap, st)
        if trapped is None:
            return super().contains_staged(st, reps)
        # Localized recovery: only trapped streams could hide a match.
        for s in trapped:
            if self._host_count_stream(st, int(s)) > 0:
                return True
        return False

    def contains_staged_early(self, st: StagedStreams, n_segments=None) -> bool:
        """Bitap machines keep the one-shot sticky register scan: it runs
        3-4x the dense sticky rate (~170/V vs 165/g GB/s, often far more
        under light load), so the dense segment grid's early exit only wins
        past corpus sizes the staged layout does not reach; localized trap
        recovery applies as usual."""
        return self.contains_staged(st)

    def _bits_tables(self):
        """Bitap step family for the match-bitmap extraction kernel
        (``pallas_scan.make_matchbits_kernel``): the D register is the
        carry, per-position counts come from the end-bit fields — so the
        1-bit/position extraction scan also runs without dependent
        gathers."""
        lay = self.bitap
        if lay.n_words != 1 or lay.has_trap:
            # The generic matchbits kernel carries ONE [R,128] scratch;
            # multi-word registers and trap-guarded CI layouts fall back
            # to the dense step family (exact in both cases).
            return super()._bits_tables()
        wl = lay.words[0]
        seed_i, endmask_i, fold = int(wl.seed), int(wl.endmask), wl.fold
        fields = wl.fields
        hp0 = _hi_pairs(wl.btab) if not fold else None

        def step_factory(table_refs, R):
            (btab_ref,) = table_refs
            b_rows = _broadcast_rows(btab_ref[:], 2, R)
            carry0 = jnp.zeros((R, 128), jnp.int32)

            def step(D, byte_rc):
                B = _b_of(byte_rc, b_rows, fold, hp0)
                D = ((D << 1) | jnp.int32(seed_i)) & B
                cnt = None
                for eb, h, w in fields:
                    f = (D >> eb) & jnp.int32(1)
                    if w != 1:
                        f = f * jnp.int32(w)
                    cnt = f if cnt is None else cnt + f
                return D, cnt

            return carry0, step

        specs = (
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        return (self._btab_dev,), specs, step_factory

    def _needle_key(self, nd) -> Optional[bytes]:
        """The track key a needle's flag lives under (CS: its bytes; CI:
        its lowered re-encoding)."""
        return ci_track_key(nd) if self.bitap.ci else bytes(nd)

    def _get_bitap_presence_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if not hasattr(self, "_bitap_presence"):
            self._bitap_presence = {}
        if key not in self._bitap_presence:
            n_tiles = T // self.t_tile
            lay = self.bitap
            kernel = _make_bitap_presence_kernel(
                self.t_tile, self.R, n_tiles, reps, lay
            )
            R, t_tile = self.R, self.t_tile
            VT = len(lay.all_words())

            @jax.jit
            def run(btab, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(
                            (2 * VT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (VT, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((VT, R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((VT, R, 128), jnp.int32),
                        pltpu.VMEM((VT, R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(btab, streams)

            self._bitap_presence[key] = run
        return self._bitap_presence[key]

    def needle_presence_staged(
        self, st: StagedStreams, reps: int = 1
    ) -> Optional[np.ndarray]:
        """Per-unique-needle presence flags from ONE sticky scan (the bitap
        bonus: each track's end bit is a per-needle flag; multi-word
        layouts keep one sticky plane per word so tracks never alias).
        Returns a bool array aligned with ``machine.needles`` (duplicates
        share a flag), or None when a trap fired (flags could
        under-report; the caller must use a dense path)."""
        lay = self.bitap
        fn = self._get_bitap_presence_fn(st.plan.time_len, reps)
        hits = np.asarray(fn(self._btab_dev, st.streams_dev))  # [VT, R, 128]
        if st.live_np is not None:
            hits = hits[:, st.live_np]
        aggs = [
            int(np.bitwise_or.reduce(h.reshape(-1).astype(np.int64), initial=0))
            for h in hits
        ]
        if lay.trap is not None and aggs[lay.n_words] != 0:
            return None
        if any(
            aggs[w] & int(wl.trap_endmask) for w, wl in enumerate(lay.words)
        ):
            return None  # embedded trap fired: flags could under-report
        flag = {}
        for w, wl in enumerate(lay.words):
            for key, (eb, _, _) in zip(wl.keys, wl.fields):
                flag[key] = bool(aggs[w] & (1 << eb))
        return np.asarray([flag[self._needle_key(nd)] for nd in self.machine.needles])


__all__ = [
    "BitapAcEngine",
    "BitapLayout",
    "WordLayout",
    "ci_track_key",
    "plan_bitap",
    "plan_bitap_ci",
]
