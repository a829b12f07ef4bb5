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
headroom for a flush block of ``2**min_head - 1`` bytes).  IgnoreCase scans
reach this engine through the host lowering path exactly as they reach the
dense kernel (lowered needles + lowered haystack are plain CS bytes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ac import AcMachine
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

    @property
    def n_words(self) -> int:
        return len(self.words)


def _pack_words(uniq, mult, min_head: int):
    """Greedy sequential packing of ascending-length needles into 30-bit
    words (tracks never span words; the shortest needle of each word goes
    first so later tracks' lengths double as count-field headroom)."""
    words = []
    i = 0
    while i < len(uniq):
        seed = 0
        endmask = 0
        btab = np.zeros(256, dtype=np.int64)
        fields = []
        off = 0
        took = 0
        while i < len(uniq):
            nd = uniq[i]
            end = off + len(nd) - 1
            # A track may turn out to be the last in its word, so it must
            # leave min_head bits of final headroom; close the word early
            # and spill to the next one otherwise.
            if MAX_TRACK_BITS - end < min_head:
                break
            # Tentative: the field needs headroom to the NEXT track in this
            # word, or to bit 30 if it ends the word.  Place it, fix the
            # previous field's recorded headroom.
            seed |= 1 << off
            for pp, b in enumerate(nd):
                btab[b] |= 1 << (off + pp)
            endmask |= 1 << end
            fields.append([end, MAX_TRACK_BITS - end, mult[nd]])
            if len(fields) > 1:
                fields[-2][1] = end - fields[-2][0]
            took += 1
            i += 1
            if i < len(uniq):
                head = max(len(uniq[i]), min_head)
                off = end + 1 + (head - len(uniq[i]))  # guard bits
        if took == 0:
            return None  # single needle longer than a word
        assert all(h >= min_head for _, h, _ in fields)
        words.append(
            WordLayout(
                seed=seed,
                endmask=endmask,
                btab=btab,
                fields=tuple((e, h, w) for e, h, w in fields),
            )
        )
    return tuple(words)


def plan_bitap(
    machine: AcMachine, max_unroll: int = 8, max_words: int = 3
) -> Optional[BitapLayout]:
    """Track layout for ``machine``'s needles, or None if ineligible.

    Unique needles get one track each (duplicates fold into the field's
    multiplicity weight), bin-packed into at most ``max_words`` int32
    registers.  The largest flush block (power of two <= ``max_unroll``)
    that every count field can absorb without carry overflow is chosen;
    layouts that cannot fit even single-byte flush blocks return None.
    """
    if getattr(machine, "composed_ci", False):
        return None
    if not machine.needles:
        return None
    mult: dict = {}
    for nd in machine.needles:
        if len(nd) == 0 or 0 in nd:
            return None  # empty needle (root piggyback) / NUL (pad bytes)
        mult[bytes(nd)] = mult.get(bytes(nd), 0) + 1
    uniq = sorted(mult, key=len)
    if sum(len(n) for n in uniq) > max_words * MAX_TRACK_BITS:
        return None

    unroll = max_unroll
    while unroll >= 1:
        min_head = max(1, int(unroll).bit_length())  # unroll < 2**min_head
        words = _pack_words(uniq, mult, min_head)
        if words is not None and len(words) <= max_words:
            return BitapLayout(words=words, unroll=unroll)
        unroll //= 2
    return None


def _b_of(byte_rc, b_rows, fold: bool):
    """byte -> int32 track mask via the 256-entry B table ([2,128] rows).

    The gather depends on the input byte only — it never touches the D
    carry chain, which is what lets this loop run past the dense kernel's
    dependent-gather floor."""
    if fold:
        return jnp.take_along_axis(b_rows[0], jnp.minimum(byte_rc, 127), axis=1)
    blo = byte_rc & 127
    m0 = jnp.take_along_axis(b_rows[0], blo, axis=1)
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
    """
    n_grid = n_tiles * reps
    unroll = lay.unroll
    V = lay.n_words

    def kernel(
        bscal_ref,  # SMEM [2] int32: [max warm_start, _]
        btab_ref,  # [2V, 128] int32 byte -> mask, rows (2w, 2w+1) per word
        warm_ref,  # [R, 128] int32
        streams_ref,  # [T_TILE, R, 128] uint8 tile
        out_ref,  # [R, 128] int32 per-stream counts
        d_scr,  # [V, R, 128] int32 bitap registers
        cnt_scr,  # [R, 128] int32 counts
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((V, R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_cnt():
            cnt_scr[:] = jnp.zeros((R, 128), jnp.int32)

        b_rows = _broadcast_rows(btab_ref[:], 2 * V, R)
        warm = warm_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                *D, counts = carry
                D = list(D)
                blk = [None] * V
                for j in range(unroll):
                    t = u * unroll + j
                    byte = streams_ref[t].astype(jnp.int32)
                    for w, wl in enumerate(lay.words):
                        B = _b_of(byte, b_rows[2 * w : 2 * w + 2], wl.fold)
                        D[w] = ((D[w] << 1) | jnp.int32(int(wl.seed))) & B
                        e = D[w] & jnp.int32(int(wl.endmask))
                        if masked:
                            e = jnp.where(t0 + t >= warm, e, 0)
                        blk[w] = e if blk[w] is None else blk[w] + e
                for w, wl in enumerate(lay.words):
                    for eb, h, wt in wl.fields:
                        f = (blk[w] >> eb) & jnp.int32((1 << h) - 1)
                        counts = counts + (f * jnp.int32(wt) if wt != 1 else f)
                return (*D, counts)

            return body

        is_boundary = t0 < bscal_ref[0]
        carry0 = (*(d_scr[w] for w in range(V)), cnt_scr[:])
        *D, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            carry0,
        )
        for w in range(V):
            d_scr[w] = D[w]
        cnt_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = cnt_scr[:]

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
    mirrors the dense sticky kernel's warm-free design)."""
    n_grid = n_tiles * reps
    unroll = lay.unroll
    V = lay.n_words

    def kernel(btab_ref, streams_ref, out_ref, d_scr, hit_scr):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_d():
            d_scr[:] = jnp.zeros((V, R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_hits():
            hit_scr[:] = jnp.zeros((R, 128), jnp.int32)

        b_rows = _broadcast_rows(btab_ref[:], 2 * V, R)

        def body(u, carry):
            *D, hits = carry
            D = list(D)
            for j in range(unroll):
                t = u * unroll + j
                byte = streams_ref[t].astype(jnp.int32)
                for w, wl in enumerate(lay.words):
                    B = _b_of(byte, b_rows[2 * w : 2 * w + 2], wl.fold)
                    D[w] = ((D[w] << 1) | jnp.int32(int(wl.seed))) & B
                    hits = hits | (D[w] & jnp.int32(int(wl.endmask)))
            return (*D, hits)

        carry0 = (*(d_scr[w] for w in range(V)), hit_scr[:])
        *D, hits = jax.lax.fori_loop(0, T_TILE // unroll, body, carry0)
        for w in range(V):
            d_scr[w] = D[w]
        hit_scr[:] = hits

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = hit_scr[:]

    return kernel


class BitapAcEngine(PallasAcEngine):
    """``PallasAcEngine`` with bitap count/contains fast paths.

    Everything else (staging, stream plans, state/extraction kernels,
    adopt_staged, bitmap paths) is inherited from the dense engine — the
    dense tables for bitap-eligible machines are tiny, so carrying both
    costs nothing and keeps the full engine surface intact.
    """

    def __init__(self, machine: AcMachine, **kw):
        super().__init__(machine, **kw)
        lay = plan_bitap(machine)
        if lay is None:
            raise ValueError("machine is not bitap-eligible; use plan_bitap first")
        self.bitap = lay
        bt = np.stack([wl.btab for wl in lay.words])  # [V, 256]
        self._btab_dev = jnp.asarray(
            bt.reshape(2 * lay.n_words, 128).astype(np.int32)
        )
        self._bitap_count = {}
        self._bitap_contains = {}

    def _get_count_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._bitap_count:
            n_tiles = T // self.t_tile
            kernel = _make_bitap_count_kernel(
                self.t_tile, self.R, n_tiles, reps, self.bitap
            )
            R, t_tile, V = self.R, self.t_tile, self.bitap.n_words

            @jax.jit
            def run(bscal, btab, warm, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(
                            (2 * V, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((V, R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(bscal, btab, warm, streams)

            self._bitap_count[key] = run
        return self._bitap_count[key]

    def count_staged(self, st: StagedStreams, reps: int = 1) -> int:
        fn = self._get_count_fn(st.plan.time_len, reps)
        counts = fn(self._bscal_for(st), self._btab_dev, st.warm_t, st.streams_dev)
        counts = np.asarray(counts, dtype=np.int64)
        if st.live_np is not None:
            counts = counts[st.live_np]
        return int(counts.sum())

    def _get_contains_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._bitap_contains:
            n_tiles = T // self.t_tile
            kernel = _make_bitap_contains_kernel(
                self.t_tile, self.R, n_tiles, reps, self.bitap
            )
            R, t_tile, V = self.R, self.t_tile, self.bitap.n_words

            @jax.jit
            def run(btab, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(
                            (2 * V, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((V, R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(btab, streams)

            self._bitap_contains[key] = run
        return self._bitap_contains[key]

    def contains_staged(self, st: StagedStreams, reps: int = 1) -> bool:
        fn = self._get_contains_fn(st.plan.time_len, reps)
        out = np.asarray(fn(self._btab_dev, st.streams_dev))
        if st.live_np is not None:
            out = out[st.live_np]
        return bool((out != 0).any())

    def _bits_tables(self):
        """Bitap step family for the match-bitmap extraction kernel
        (``pallas_scan.make_matchbits_kernel``): the D register is the
        carry, per-position counts come from the end-bit fields — so the
        1-bit/position extraction scan also runs without dependent
        gathers."""
        lay = self.bitap
        if lay.n_words != 1:
            # The generic matchbits kernel carries ONE [R,128] scratch;
            # multi-word registers fall back to the dense step family.
            return super()._bits_tables()
        wl = lay.words[0]
        seed_i, endmask_i, fold = int(wl.seed), int(wl.endmask), wl.fold
        fields = wl.fields

        def step_factory(table_refs, R):
            (btab_ref,) = table_refs
            b_rows = _broadcast_rows(btab_ref[:], 2, R)
            carry0 = jnp.zeros((R, 128), jnp.int32)

            def step(D, byte_rc):
                B = _b_of(byte_rc, b_rows, fold)
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

    def needle_presence_staged(self, st: StagedStreams, reps: int = 1) -> np.ndarray:
        """Per-unique-needle presence flags from ONE sticky scan (the bitap
        bonus: each track's end bit is a per-needle flag).  Returns a bool
        array aligned with ``machine.needles`` (duplicates share a flag)."""
        if self.bitap.n_words != 1:
            raise NotImplementedError(
                "per-needle presence bits merge across words; available for "
                "single-word layouts only"
            )
        fn = self._get_contains_fn(st.plan.time_len, reps)
        out = np.asarray(fn(self._btab_dev, st.streams_dev))
        if st.live_np is not None:
            out = out[st.live_np]
        agg = np.bitwise_or.reduce(out.reshape(-1).astype(np.int64), initial=0)
        uniq = {}
        for nd in self.machine.needles:
            if bytes(nd) not in uniq:
                uniq[bytes(nd)] = None
        order = sorted(uniq, key=len)
        flag = {
            nd: bool(agg & (1 << eb))
            for nd, (eb, _, _) in zip(order, self.bitap.words[0].fields)
        }
        return np.asarray([flag[bytes(nd)] for nd in self.machine.needles])


__all__ = ["BitapAcEngine", "BitapLayout", "WordLayout", "plan_bitap"]
