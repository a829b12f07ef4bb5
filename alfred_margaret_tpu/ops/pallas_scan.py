"""Pallas TPU kernel: the bytes/s workhorse for Aho-Corasick matching.

Why not a plain table gather? XLA:TPU lowers ``jnp.take`` to a *serialized*
gather (~0.1 G-gathers/s measured on v5e — experiments/tpu_sustained.py),
while Mosaic's ``tpu.dynamic_gather`` sustains ~385 G-elements/s but only
supports per-lane lookups within **128-entry table rows** (and 8-entry
sublane columns). The kernel therefore reshapes the automaton until every
step fits that primitive:

1. **Byte-class compression**: bytes with identical ``delta`` columns are
   one equivalence class (a byte not occurring in any needle always maps to
   class 0). 256 bytes -> k classes, k typically ~ distinct needle bytes + 1.
   The class map is a 256-entry lookup = 2 row-gathers + 1 select.
2. **Packed flat table**: ``packed[s * k + c] = (match_count << 20) | (next_state * k)``
   — the next-state is pre-multiplied by k so the next flat index is one add,
   and the match count rides along for free (no second lookup).
3. **Row-gather + select chain**: the flat table (``n_states * k`` entries,
   padded to rows of 128) is held as VMEM rows; a lookup gathers every row at
   the lane index ``idx & 127`` (one ``dynamic_gather`` each) and selects by
   ``idx >> 7``. Cost ~ 2 vector ops per 128 table entries per 1024 streams.

Streams are laid out ``[T, S]`` time-major exactly as in ``xla_scan`` (same
warm-up overlap semantics); the grid walks time tiles, states/counts persist
in scratch across sequential grid steps (TPU grid execution is sequential on
a core), and Pallas double-buffers the HBM->VMEM stream tile DMA
automatically via the BlockSpec pipeline.

Capacity: ``n_states * k <= MAX_ROWS * 128`` (default 8192 entries). Bigger
automata fall back to other engines (see ``engine.MatchEngine``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ac import AcMachine
from ..utils import utf8
from .xla_scan import StreamPlan, build_streams, stage_streams_device

#: Maximum flat-table rows (of 128 int32 entries) the kernel will hold and
#: scan with its select chain.  Above ~48 rows the Mosaic compiler on this
#: toolchain fails outright (and the select chain is past its useful speed
#: anyway); bigger automata go through the needle-grouped multi-pass engine
#: (``ops.grouped``).
MAX_ROWS = 48

#: Packed-entry layouts.  packing=1: one int32 entry per lane — low 20 bits
#: next_state * k, high 12 bits match count.  packing=2: two 16-bit entries
#: per int32 lane (low 13 bits next_state * k, top 3 bits count) — halves
#: the select-chain rows AND doubles capacity when the automaton fits the
#: narrower fields (idx < 8192, per-state count <= 7).
_STATE_BITS = 20
_STATE_MASK = (1 << _STATE_BITS) - 1
_STATE_BITS16 = 13
_STATE_MASK16 = (1 << _STATE_BITS16) - 1


class CapacityError(ValueError):
    """Automaton too large for the Pallas kernel's table budget."""


def _fit_unroll(unroll: int, t_tile: int) -> int:
    """Largest unroll <= the requested one that divides t_tile (a
    non-dividing unroll would silently skip t_tile % unroll steps per
    tile in the fori_loop(t_tile // unroll) bodies)."""
    unroll = max(1, min(unroll, t_tile))
    while t_tile % unroll:
        unroll -= 1
    return unroll


def _zero_inert(machine) -> bool:
    """True when scanning right-padding zeros is a no-op for the machine:
    byte 0 drives every state to the root and the root emits nothing —
    holds unless some needle contains NUL (or the empty needle).  Then
    only warm-up masking is ever needed and the valid-end freeze can be
    disabled entirely (pad bytes count 0 and can never create a match or
    absorption), which keeps the interior-tile fast path active even for
    corpora that do not exactly fill the stream grid."""
    return bool((machine.delta[:, 0] == 0).all()) and int(machine.match_count[0]) == 0


def _boundary_scalars(warm: np.ndarray, vend: np.ndarray, zero_inert: bool) -> np.ndarray:
    """[max warm, freeze boundary] for the interior-tile fast path.

    With an inert zero byte the freeze boundary is +inf (pads are no-ops).
    Otherwise (NUL-containing needles) the minimum vend over live streams
    bounds the unmasked region; fully padded streams (vend == 0) are
    excluded — they are frozen by masked tiles and nulled at reduction."""
    if zero_inert:
        return np.array([int(warm.max()) if len(warm) else 0, 1 << 30], dtype=np.int32)
    nz = vend[vend > 0]
    return np.array(
        [int(warm.max()) if len(warm) else 0, int(nz.min()) if len(nz) else 0],
        dtype=np.int32,
    )


@dataclass
class CompressedMachine:
    """Byte-class-compressed, packed automaton arrays (host side)."""

    classmap: np.ndarray  # uint8/int32 [256] byte -> class
    packed: np.ndarray  # int32 [rows * 128] flat entries (see packing)
    n_states: int
    k: int  # number of byte classes
    rows: int  # physical 128-lane rows of `packed`
    packing: int = 1  # entries per int32 lane (1 or 2)

    @property
    def state_bits(self) -> int:
        return _STATE_BITS16 if self.packing == 2 else _STATE_BITS

    @property
    def state_mask(self) -> int:
        return (1 << self.state_bits) - 1

    @staticmethod
    def from_machine(
        machine: AcMachine, max_rows: int = MAX_ROWS, force_packing: Optional[int] = None
    ) -> "CompressedMachine":
        delta = machine.delta  # [S, 256]
        n_states = delta.shape[0]
        # Byte-class compression: unique delta columns become classes.
        cols = np.ascontiguousarray(delta.T)  # [256, S]
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        k = uniq.shape[0]
        n_entries = n_states * k
        max_count = int(machine.match_count.max(initial=0))
        comp = uniq.T.astype(np.int64)  # [n_states, k] next-state per class

        # 16-bit packing only pays when it reduces physical rows (the
        # unpack costs ~3 ops per lookup); single-row tables stay 32-bit.
        if (
            force_packing != 1
            and n_entries > 128
            and n_entries < (1 << _STATE_BITS16)
            and max_count <= 7
        ):
            # 16-bit entries, two per lane: half the select-chain rows,
            # double the capacity.
            if n_entries > max_rows * 256:
                raise CapacityError(
                    f"n_states*k = {n_entries} exceeds {max_rows*256} "
                    "16-bit packed entries"
                )
            e = (machine.match_count.astype(np.int64)[comp] << _STATE_BITS16) | (
                comp * k
            )
            flat = e.reshape(-1)
            n_pairs = -(-len(flat) // 2)
            pairs = np.zeros(n_pairs * 2, dtype=np.int64)
            pairs[: len(flat)] = flat
            out = pairs[0::2] | (pairs[1::2] << 16)
            rows = -(-len(out) // 128)
            padded = np.zeros(rows * 128, dtype=np.int64)
            padded[: len(out)] = out
            return CompressedMachine(
                classmap=inv.astype(np.int32),
                packed=padded.astype(np.int32),
                n_states=n_states,
                k=k,
                rows=rows,
                packing=2,
            )

        if n_entries > max_rows * 128:
            raise CapacityError(
                f"n_states*k = {n_states}*{k} = {n_entries} exceeds "
                f"{max_rows*128} packed entries"
            )
        # 31, not 32: a count in the top bit would make the packed int32
        # negative and ``v >> state_bits`` (arithmetic shift) would return
        # a negative count.
        if max_count >= (1 << (31 - _STATE_BITS)):
            raise CapacityError("per-state match count exceeds packed field")
        if n_entries >= (1 << _STATE_BITS):
            raise CapacityError("state*k exceeds packed state field")
        packed = (machine.match_count.astype(np.int64)[comp] << _STATE_BITS) | (
            comp * k
        )
        flat = packed.reshape(-1)
        rows = -(-len(flat) // 128)
        out = np.zeros(rows * 128, dtype=np.int64)
        out[: len(flat)] = flat
        return CompressedMachine(
            classmap=inv.astype(np.int32),
            packed=out.astype(np.int32),
            n_states=n_states,
            k=k,
            rows=rows,
            packing=1,
        )


def _broadcast_rows(table, rows: int, R: int):
    """Hoist each 128-wide table row into an [R, 128] broadcast (done once
    per kernel invocation, outside the time loop)."""
    return [
        jax.lax.broadcast_in_dim(table[r], (R, 128), (1,)) for r in range(rows)
    ]


def _lookup_flat(
    row_bcasts, idx, packing: int = 1, in_range: bool = False, wrap: bool = False
):
    """Gather the packed entry at flat index ``idx`` over [R,128] lanes:
    one dynamic_gather per physical table row plus a select chain.  With
    ``packing == 2`` the physical index is ``idx >> 1`` and the 16-bit half
    is selected by ``idx & 1``.  ``in_range=True`` asserts (statically) that
    every possible index hits row 0 (n_states*k <= 128*packing), dropping
    the ``& 127`` lane clamp from the dependent chain.  ``wrap=True``
    re-adds the clamp to emulate the TPU's native mod-128 lane indexing
    (measured: garbage high index bits are ignored in hardware) for
    interpreter mode, where JAX clamps out-of-range gathers instead."""
    phys = (idx >> 1) if packing == 2 else idx
    lo = (phys & 127) if (wrap or not in_range) else phys
    hi = phys >> 7
    out = None
    for r, row in enumerate(row_bcasts):
        cand = jnp.take_along_axis(row, lo, axis=1)
        out = cand if out is None else jnp.where(hi == r, cand, out)
    if packing == 2:
        out = jnp.where((idx & 1) == 1, out >> 16, out) & 0xFFFF
    return out


#: Use the gather-free weighted compare chain for the byte->class map when
#: the classmap has at most this many value boundaries over 0..255.  The
#: steady loop is GATHER-throughput-bound (~112 GB/s at 2 gathers/byte, the
#: 1-gather ceiling is ~165 — experiments/tpu_runs_classifier.py), so
#: trading the classmap gather for ~1.6 ALU ops per boundary wins by ~44%
#: at 9 boundaries and stays well ahead through the canonical lowercase
#: a-z needle alphabet (27 boundaries).
WRUNS_MAX_BOUNDARIES = 32


def _classmap_wpairs(cm256: np.ndarray):
    """``(init, ((s_i, delta_i), ...))`` telescoping the 256-entry classmap:
    class(b) = init + sum(delta_i for s_i <= b), or None if the boundary
    count exceeds ``WRUNS_MAX_BOUNDARIES``."""
    pairs = [
        (b, int(cm256[b]) - int(cm256[b - 1]))
        for b in range(1, 256)
        if cm256[b] != cm256[b - 1]
    ]
    if len(pairs) > WRUNS_MAX_BOUNDARIES:
        return None
    return (int(cm256[0]), tuple(pairs))


def _class_of(byte_rc, cls_rows, fold: bool = False, wpairs=None):
    """Byte -> class: 256-entry lookup as 2 row-gathers + select.  With
    ``fold=True`` (every byte >= 127 maps to the same class — true whenever
    all needle bytes are ASCII < 0x7F) the high half of the map collapses
    into entry 127, so the lookup is one ``min`` + one row-gather.  With
    ``wpairs`` (from ``_classmap_wpairs``) the lookup is a gather-free
    weighted compare chain — the fastest mode on gather-bound loops."""
    if wpairs is not None:
        init, pairs = wpairs
        cls = jnp.full(byte_rc.shape, init, jnp.int32)
        for s0, d0 in pairs:
            cls = cls + jnp.where(byte_rc >= s0, jnp.int32(d0), jnp.int32(0))
        return cls
    if fold:
        return jnp.take_along_axis(cls_rows[0], jnp.minimum(byte_rc, 127), axis=1)
    blo = byte_rc & 127
    c0 = jnp.take_along_axis(cls_rows[0], blo, axis=1)
    c1 = jnp.take_along_axis(cls_rows[1], blo, axis=1)
    return jnp.where(byte_rc < 128, c0, c1)


def _make_count_kernel(
    T_TILE: int,
    R: int,
    rows: int,
    n_tiles: int,
    unroll: int,
    reps: int,
    packing: int = 1,
    fold: bool = False,
    in_range: bool = False,
    defer: bool = False,
    nomask: bool = False,
    interpret: bool = False,
    wpairs=None,
):
    """Count kernel over a ``n_tiles * reps`` grid.

    ``reps > 1`` re-scans the same resident streams (index map wraps at
    ``n_tiles``); per-rep the state resets and warm-up masking reapplies, so
    total counts are exactly ``reps *`` the single-pass counts — used for
    sustained-throughput measurement without re-staging data.

    Validity masking costs ~4 vector ops per step, but only tiles that
    contain a warm-up or valid-end boundary need it; interior tiles take the
    unmasked loop (boundary scalars prefetched via SMEM).
    """
    n_grid = n_tiles * reps
    state_bits = _STATE_BITS16 if packing == 2 else _STATE_BITS
    state_mask = (1 << state_bits) - 1

    def kernel(
        bscal_ref,  # SMEM [2] int32: [max warm_start, min valid_end]
        classmap_ref,  # [2, 128] int32 (byte classes; 256 entries)
        table_ref,  # [rows, 128] int32 packed
        warm_ref,  # [R, 128] int32 warm_start per stream
        vend_ref,  # [R, 128] int32 valid_end per stream
        streams_ref,  # [T_TILE, R, 128] uint8 tile
        out_ref,  # [R, 128] int32 per-stream counts
        state_scr,  # [R, 128] int32 scratch: packed idx base (state*k)
        count_scr,  # [R, 128] int32 scratch
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)

        @pl.when(tile == 0)
        def _init_count():
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        row_bcasts = _broadcast_rows(table_ref[:], rows, R)
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                sbase, counts = carry
                # Interior tiles with ``defer``: accumulate the raw packed
                # entries and extract the count sum once per unroll block —
                # the state field's partial sums stay below bit
                # ``state_bits`` (guaranteed by the n_entries*unroll bound
                # checked at kernel-build time), so ``vsum >> state_bits``
                # is exactly the block's match-count sum.
                vsum = None
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    v = _lookup_flat(
                        row_bcasts, sbase + cls, packing, in_range,
                        wrap=nomask and interpret,
                    )
                    # ``nomask``: carry the raw packed entry — the TPU's
                    # lane gather indexes mod 128, and the count field
                    # (bit >= state_bits >= 7) is a multiple of 128, so the
                    # next ``sbase + cls`` still lands on the right entry.
                    # Requires in_range (single physical row) and packing 1.
                    sbase = v if nomask else v & state_mask
                    if masked:
                        tg = t0 + t
                        cnt = jnp.where(
                            (tg >= warm) & (tg < vend), v >> state_bits, 0
                        )
                        counts = counts + cnt
                    elif defer:
                        vsum = v if vsum is None else vsum + v
                    else:
                        counts = counts + (v >> state_bits)
                if not masked and defer:
                    counts = counts + (vsum >> state_bits)
                return sbase, counts

            return body

        is_boundary = (t0 < bscal_ref[0]) | (t0 + T_TILE > bscal_ref[1])
        sbase, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            (state_scr[:], count_scr[:]),
        )
        state_scr[:] = sbase
        count_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


class _StickyView:
    """Absorbing-state view of an ``AcMachine`` for existence queries.

    Entering any match state (``match_count > 0``) is redirected to a new
    absorbing state that loops to itself, and all counts are dropped — so a
    scan needs no per-byte count accumulation at all: the final state says
    whether any match was seen.  Mirrors the reference's ``containsAny``
    early-exit fold (``AhoCorasick/Searcher.hs:156-164``) — no early exit on
    SIMD hardware, but 2 fewer vector ops per byte than counting.
    """

    def __init__(self, machine: AcMachine):
        delta = machine.delta
        n = delta.shape[0]
        self.absorb = n
        d2 = np.empty((n + 1, 256), dtype=np.int32)
        d2[:n] = np.where(machine.match_count[delta] > 0, n, delta)
        d2[n] = n
        self.delta = d2
        self.match_count = np.zeros(n + 1, dtype=np.int32)
        # Failure links (used only as default-row candidates by the comb
        # engine's build; the absorbing state nominally fails to root).
        self.fail = (
            np.concatenate([machine.fail, np.zeros(1, machine.fail.dtype)])
            if machine.fail is not None
            else None
        )


def _make_contains_kernel(
    T_TILE: int,
    R: int,
    rows: int,
    n_tiles: int,
    unroll: int,
    reps: int,
    packing: int = 1,
    fold: bool = False,
    in_range: bool = False,
    wpairs=None,
):
    """Existence kernel over the sticky (absorbing) table: carries only the
    state, no count ops.  Sticky entries are pure ``state * k`` (no count
    bits), so no masking of the carried value is ever needed.  Boundary
    tiles freeze the state past each stream's valid end so right-padding
    zeros can't absorb (warm-region matches are real haystack bytes and may
    absorb freely — existence is global, attribution doesn't matter)."""
    n_grid = n_tiles * reps

    def kernel(
        bscal_ref,  # SMEM [2] int32 (only [1] = min valid_end used)
        classmap_ref,  # [2, 128] int32
        table_ref,  # [rows, 128] int32 packed (sticky: counts all zero)
        vend_ref,  # [R, 128] int32 valid_end per stream
        streams_ref,  # [T_TILE, R, 128] uint8 tile
        out_ref,  # [R, 128] int32 final sticky state*k per stream
        state_scr,  # [R, 128] int32
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        row_bcasts = _broadcast_rows(table_ref[:], rows, R)
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, sbase):
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    v = _lookup_flat(row_bcasts, sbase + cls, packing, in_range)
                    sbase = jnp.where(t0 + t < vend, v, sbase) if masked else v
                return sbase

            return body

        is_boundary = t0 + T_TILE > bscal_ref[1]
        sbase = jax.lax.cond(
            is_boundary,
            lambda s: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), s),
            lambda s: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), s),
            state_scr[:],
        )
        state_scr[:] = sbase

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = state_scr[:]

    return kernel


def _make_states_kernel(
    T_TILE: int,
    R: int,
    rows: int,
    unroll: int,
    packing: int = 1,
    fold: bool = False,
    in_range: bool = False,
    wpairs=None,
):
    """Same scan, but emits the packed table value per position; the host
    recovers the state id as ``(v & mask) // k``."""

    def kernel(
        classmap_ref,
        table_ref,
        streams_ref,  # [T_TILE, R, 128] uint8
        out_ref,  # [T_TILE, R, 128] int32 packed values per position
        state_scr,  # [R, 128] int32
    ):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            state_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        row_bcasts = _broadcast_rows(table_ref[:], rows, R)

        def body(u, sbase):
            for j in range(unroll):
                t = u * unroll + j
                cls = _class_of(streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs)
                v = _lookup_flat(row_bcasts, sbase + cls, packing, in_range)
                out_ref[t] = v
                sbase = v & (
                    _STATE_MASK16 if packing == 2 else _STATE_MASK
                )
            return sbase

        state_scr[:] = jax.lax.fori_loop(0, T_TILE // unroll, body, state_scr[:])

    return kernel


@dataclass
class StagedStreams:
    """Device-resident stream layout, reusable across scans (and across the
    grouped engine's needle-group passes)."""

    plan: StreamPlan
    streams_dev: Any  # [T, S] uint8 device array
    warm_np: np.ndarray  # int32 [S] host copy (final_states assembly)
    warm_t: Any  # [R, 128] int32 device
    vend_t: Any  # [R, 128] int32 device
    bscal: Any  # [2] int32 device (SMEM boundary scalars)
    #: bool [R, 128]: streams with any emission.  Interior (unmasked) tiles
    #: scan fully-padded streams' zero windows live, so their counts and
    #: sticky absorbs are garbage and must be excluded at reduction.
    live_np: Any = None
    #: Whether ``bscal`` was computed with the no-freeze fast path (the
    #: STAGING engine's machine was zero-inert).  A different engine
    #: sharing this staging (grouped multi-pass) must fall back to the
    #: conservative scalars if its own machine is not.
    zero_inert: bool = False
    _bscal_strict: Any = None
    #: Host reference to the raw corpus bytes (staged scans keep it so the
    #: match-bitmap path can re-derive hit states without any big device
    #: readback); None when staging was handed pre-built streams only.
    data_np: Any = None


class PallasAcEngine:
    """TPU engine running the class-compressed DFA in a Pallas kernel.

    Capacity-limited (``CapacityError`` when n_states*k exceeds the table
    budget); the dispatching ``MatchEngine`` treats that as "use another
    backend". ``interpret=True`` runs the kernel in interpreter mode for
    CPU-only tests.
    """

    def __init__(
        self,
        machine: AcMachine,
        n_streams: int = 32768,
        t_tile: int = 128,
        max_rows: int = MAX_ROWS,
        interpret: bool = False,
        unroll: Optional[int] = None,
        overlap: Optional[int] = None,
    ):
        if n_streams % 128:
            raise ValueError("n_streams must be a multiple of 128")
        self.machine = machine
        self.comp = CompressedMachine.from_machine(machine, max_rows)
        if unroll is None:
            # The select chain's unrolled body size grows with rows * unroll;
            # keep compile time (and i-cache pressure) bounded.
            unroll = 8 if self.comp.rows <= 8 else (4 if self.comp.rows <= 16 else 2)
        if t_tile % unroll:
            raise ValueError("t_tile must be a multiple of unroll")
        self.unroll = unroll
        self.R = n_streams // 128
        self.S = n_streams
        self.t_tile = t_tile
        self.interpret = interpret
        self.overlap = (
            max(0, machine.max_needle_bytes - 1) if overlap is None else overlap
        )
        if self.overlap < max(0, machine.max_needle_bytes - 1):
            raise ValueError("overlap override below the machine's requirement")
        cm = np.zeros(256, dtype=np.int32)
        cm[: len(self.comp.classmap)] = self.comp.classmap
        n_entries = self.comp.n_states * self.comp.k
        # Steady-loop op-shaving eligibility (see _class_of/_lookup_flat and
        # the deferred-count accumulation in _make_count_kernel):
        self._fold = bool((cm[127:] == cm[127]).all())
        self._in_range = n_entries <= 128 * self.comp.packing
        max_count = int(machine.match_count.max(initial=0))
        self._defer = (
            self.comp.packing == 1
            # state-field partial sums must stay below bit _STATE_BITS ...
            and (n_entries - 1) * self.unroll < (1 << _STATE_BITS)
            # ... and count-field partial sums below the int32 sign bit.
            and max_count * self.unroll < (1 << (31 - _STATE_BITS))
        )
        # Raw-entry state carry: the TPU lane gather indexes mod 128, so the
        # packed count bits (multiples of 2**_STATE_BITS, hence of 128) never
        # perturb an in-range single-row lookup (measured on hardware, see
        # experiments/tpu_gather_semantics.py).
        self._nomask = self._in_range and self.comp.packing == 1
        # Gather-free byte->class compare chain (the loop is gather-bound:
        # 2 gathers/byte ~112 GB/s vs 1 gather/byte ~151 measured,
        # experiments/tpu_runs_classifier.py).
        self._wpairs = _classmap_wpairs(cm)
        self._classmap_dev = jnp.asarray(cm.reshape(2, 128))
        self._table_dev = jnp.asarray(self.comp.packed.reshape(self.comp.rows, 128))
        self._count_fn = {}
        self._states_fn = {}
        self.max_rows = max_rows
        self._contains_state: Optional[dict] = None  # lazy sticky machinery
        # Count field position in emitted packed values (subclasses with a
        # different packing override this and ``_pk_states``).
        self._count_shift = self.comp.state_bits

    # -- layout ------------------------------------------------------------

    def _layout(self, data: np.ndarray):
        # Fixed stream count (the kernel shape bakes in R = S/128); streams
        # beyond the data are all-masked. Time padded to a t_tile multiple.
        emit = max(1, -(-len(data) // self.S))
        time_len = emit + self.overlap
        T = -(-time_len // self.t_tile) * self.t_tile
        plan = StreamPlan(
            n=len(data),
            n_streams=self.S,
            emit_len=emit,
            overlap=self.overlap,
            time_len=T,
        )
        streams_ts, warm, vend = build_streams(data, plan)
        return plan, streams_ts, warm, vend

    def _get_count_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._count_fn:
            n_tiles = T // self.t_tile
            kernel = _make_count_kernel(
                self.t_tile,
                self.R,
                self.comp.rows,
                n_tiles,
                self.unroll,
                reps,
                self.comp.packing,
                fold=self._fold,
                in_range=self._in_range,
                defer=self._defer,
                nomask=self._nomask,
                interpret=self.interpret,
                wpairs=self._wpairs,
            )
            R, S, t_tile = self.R, self.S, self.t_tile

            @jax.jit
            def run(bscal, classmap, table, warm, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (self.comp.rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(bscal, classmap, table, warm, vend, streams)

            self._count_fn[key] = run
        return self._count_fn[key]

    def _states_t_tile(self) -> int:
        """Time tile for the states kernel: its int32 output block plus the
        uint8 input block, both double-buffered, must fit the ~16 MiB scoped
        VMEM budget (10 bytes/stream/step total)."""
        budget = 12 << 20
        tt = self.t_tile
        while tt > 8 and tt * self.S * 10 > budget:
            tt //= 2
        return max(tt, 8)

    def _get_states_fn(self, T: int):
        key = T
        if key not in self._states_fn:
            t_tile = self._states_t_tile()
            n_tiles = T // t_tile
            unroll = _fit_unroll(self.unroll, t_tile)
            kernel = _make_states_kernel(
                t_tile,
                self.R,
                self.comp.rows,
                unroll,
                self.comp.packing,
                fold=self._fold,
                in_range=self._in_range,
                wpairs=self._wpairs,
            )
            R, S = self.R, self.S

            @jax.jit
            def run(classmap, table, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (self.comp.rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((T, R, 128), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
                    interpret=self.interpret,
                )(classmap, table, streams).reshape(T, S)

            self._states_fn[key] = run
        return self._states_fn[key]

    def _stream_arrays(self, streams_ts, warm, vend):
        streams_u8 = jnp.asarray(streams_ts)  # uint8 over the wire
        warm_t = jnp.asarray(warm.reshape(self.R, 128))
        vend_t = jnp.asarray(vend.reshape(self.R, 128))
        # Boundary scalars for the interior-tile fast path (SMEM).
        bscal = jnp.asarray(_boundary_scalars(warm, vend, _zero_inert(self.machine)))
        return streams_u8, warm_t, vend_t, bscal

    # -- public ops --------------------------------------------------------

    def stage(self, data: np.ndarray) -> StagedStreams:
        """Stage a corpus on-device once; reusable across count/state scans
        (and across the grouped engine's needle-group passes)."""
        emit = max(1, -(-len(data) // self.S))
        time_len = emit + self.overlap
        T = -(-time_len // self.t_tile) * self.t_tile
        plan = StreamPlan(
            n=len(data),
            n_streams=self.S,
            emit_len=emit,
            overlap=self.overlap,
            time_len=T,
        )
        streams_dev, warm, vend = stage_streams_device(data, plan)
        zi = _zero_inert(self.machine)
        bscal = jnp.asarray(_boundary_scalars(warm, vend, zi))
        return StagedStreams(
            plan=plan,
            streams_dev=streams_dev,
            warm_np=warm,
            warm_t=jnp.asarray(warm.reshape(self.R, 128)),
            vend_t=jnp.asarray(vend.reshape(self.R, 128)),
            bscal=bscal,
            live_np=(vend.reshape(self.R, 128) > 0),
            zero_inert=zi,
            data_np=data,
        )

    def _bscal_for(self, st: StagedStreams):
        """Boundary scalars valid for THIS engine's machine: staging by a
        zero-inert machine records no-freeze scalars, which a non-inert
        machine (NUL needles) sharing the staging must not use."""
        if not st.zero_inert or _zero_inert(self.machine):
            return st.bscal
        if st._bscal_strict is None:
            vend = np.asarray(st.vend_t).reshape(-1)
            st._bscal_strict = jnp.asarray(_boundary_scalars(st.warm_np, vend, False))
        return st._bscal_strict

    def adopt_staged(self, st: Optional[StagedStreams]) -> Optional[StagedStreams]:
        """Validate that THIS engine can scan a staging created by another
        engine — possibly for a DIFFERENT machine.  The stream layout is
        machine-independent (raw bytes windowed; warm/vend masks depend only
        on the plan) and per-machine boundary scalars are re-derived by
        ``_bscal_for``; the grouped engine's needle-group passes already
        rely on exactly this.  Exposed so a live needle-set swap in serving
        reuses the resident corpus instead of re-paying the host->device
        transfer.  Requirements: same stream width, tile-aligned time
        length, and a staged warm-up overlap covering this machine's
        synchronization window (overlap >= max_needle_bytes - 1).  Returns
        ``st`` when compatible, None otherwise (caller restages)."""
        if st is None or st.plan.n_streams != self.S:
            return None
        if st.plan.time_len % self.t_tile:
            return None
        if st.plan.overlap < max(0, self.machine.max_needle_bytes - 1):
            return None
        return st

    def count_staged(self, st: StagedStreams, reps: int = 1) -> int:
        fn = self._get_count_fn(st.plan.time_len, reps)
        counts = fn(
            self._bscal_for(st), self._classmap_dev, self._table_dev,
            st.warm_t, st.vend_t, st.streams_dev,
        )
        counts = np.asarray(counts, dtype=np.int64)
        if st.live_np is not None:
            counts = counts[st.live_np]
        return int(counts.sum())

    def count(self, text: utf8.TextLike, reps: int = 1) -> int:
        """Total match count; ``reps > 1`` re-scans the resident streams that
        many times in one launch (returns ``reps *`` the true count — used by
        the sustained-throughput benchmark)."""
        data = utf8.to_u8(text)
        if len(data) == 0:
            return 0
        return self.count_staged(self.stage(data), reps)

    # -- existence (sticky absorbing-state) scan ---------------------------

    def _sticky_setup(self) -> dict:
        if self._contains_state is None:
            sv = _StickyView(self.machine)
            comp = CompressedMachine.from_machine(sv, self.max_rows)  # may raise CapacityError
            cm = np.zeros(256, dtype=np.int32)
            cm[: len(comp.classmap)] = comp.classmap
            self._contains_state = dict(
                comp=comp,
                fold=bool((cm[127:] == cm[127]).all()),
                in_range=comp.n_states * comp.k <= 128 * comp.packing,
                wpairs=_classmap_wpairs(cm),
                absorb_pk=sv.absorb * comp.k,
                cm=jnp.asarray(cm.reshape(2, 128)),
                tab=jnp.asarray(comp.packed.reshape(comp.rows, 128)),
                fns={},
            )
        return self._contains_state

    def _get_contains_fn(self, T: int, reps: int = 1):
        c = self._sticky_setup()
        key = (T, reps)
        if key not in c["fns"]:
            comp = c["comp"]
            n_tiles = T // self.t_tile
            unroll = _fit_unroll(
                8 if comp.rows <= 8 else (4 if comp.rows <= 16 else 2), self.t_tile
            )
            kernel = _make_contains_kernel(
                self.t_tile,
                self.R,
                comp.rows,
                n_tiles,
                unroll,
                reps,
                comp.packing,
                fold=c["fold"],
                in_range=c["in_range"],
                wpairs=c["wpairs"],
            )
            R, t_tile = self.R, self.t_tile

            @jax.jit
            def run(bscal, classmap, table, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (comp.rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128),
                            lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
                    interpret=self.interpret,
                )(bscal, classmap, table, vend, streams)

            c["fns"][key] = run
        return c["fns"][key]

    def contains_staged(self, st: StagedStreams, reps: int = 1) -> bool:
        c = self._sticky_setup()
        fn = self._get_contains_fn(st.plan.time_len, reps)
        out = np.asarray(fn(self._bscal_for(st), c["cm"], c["tab"], st.vend_t, st.streams_dev))
        if st.live_np is not None:
            out = out[st.live_np]
        return bool((out == c["absorb_pk"]).any())

    def contains(self, text: utf8.TextLike, reps: int = 1) -> bool:
        """``containsAny``: one absorbing-state scan, ~2 fewer vector ops
        per byte than counting (no count accumulation or extraction)."""
        data = utf8.to_u8(text)
        if len(data) == 0:
            return False
        return self.contains_staged(self.stage(data), reps)

    #: Segment size for the early-exit containsAny grid: segments below
    #: ~32 MiB scan faster than one relay round trip, so slicing finer
    #: only adds fetch latency.
    CONTAINS_SEG_BYTES = 32 << 20

    def _get_contains_seg_fn(self, T: int, R_seg: int, k: int):
        c = self._sticky_setup()
        key = ("seg", T, R_seg, k)
        if key not in c["fns"]:
            comp = c["comp"]
            n_tiles = T // self.t_tile
            unroll = _fit_unroll(
                8 if comp.rows <= 8 else (4 if comp.rows <= 16 else 2), self.t_tile
            )
            kernel = _make_contains_kernel(
                self.t_tile, R_seg, comp.rows, n_tiles, unroll, 1,
                comp.packing, fold=c["fold"], in_range=c["in_range"],
                wpairs=c["wpairs"],
            )
            R, t_tile = self.R, self.t_tile

            @jax.jit
            def run(bscal, classmap, table, vend, streams_u8):
                # Static segment index k in the BlockSpec index maps: the
                # kernel DMAs its stream-row window straight from the
                # staged array — no HBM copy of the segment (a traced
                # dynamic_slice materialized corpus/K bytes per call, and
                # with all K segments dispatched up front those copies
                # were live simultaneously).
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (comp.rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec((R_seg, 128), lambda i: (k, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R_seg, 128),
                            lambda i: (i, k, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec((R_seg, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((R_seg, 128), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((R_seg, 128), jnp.int32)],
                    interpret=self.interpret,
                )(bscal, classmap, table, vend, streams)

            c["fns"][key] = run
        return c["fns"][key]

    def contains_staged_early(
        self, st: StagedStreams, n_segments: Optional[int] = None
    ) -> bool:
        """Early-exit ``containsAny`` over a staged corpus: the sticky scan
        runs as K stream-row segments in CORPUS order (streams are
        corpus-ordered chunks), ALL dispatched async up front so their
        round trips overlap, with results fetched in order and the scan
        answered at the first hitting segment.  A hit in the first segment
        of an N-segment corpus costs ~1/N of the full-scan wall plus one
        round trip; a miss costs about the full scan (the device pipelines
        the queued segments back-to-back).  Mirrors the reference's
        ``Done True`` early-exit fold at segment granularity
        (``AhoCorasick/Searcher.hs:156-164``, ``Automaton.hs:398``)."""
        if n_segments is None:
            total = st.plan.time_len * self.S
            n_segments = max(1, min(16, total // max(1, self.CONTAINS_SEG_BYTES)))
        K = 1
        for cand in (16, 8, 4, 2, 1):
            if cand <= n_segments and self.R % cand == 0:
                K = cand
                break
        if K <= 1:
            return self.contains_staged(st)
        if type(self)._sticky_setup is not PallasAcEngine._sticky_setup:
            # Subclass sticky machinery (comb16/comb32) has its own table
            # family; the segment grid is built on the dense family only.
            # Checked BEFORE _sticky_setup() so the fallback does not pay
            # a sticky-table host build it may never use (the attached
            # screening filter often answers without it).
            return self.contains_staged(st)
        c = self._sticky_setup()
        R_seg = self.R // K
        bscal = self._bscal_for(st)
        outs = [
            self._get_contains_seg_fn(st.plan.time_len, R_seg, k)(
                bscal, c["cm"], c["tab"], st.vend_t, st.streams_dev
            )
            for k in range(K)
        ]  # async: all segments queue before the first fetch
        live = st.live_np
        for k, o in enumerate(outs):
            out = np.asarray(o)
            if live is not None:
                out = out[live[k * R_seg : (k + 1) * R_seg]]
            if (out == c["absorb_pk"]).any():
                return True
        return False

    def _states_call(self, st: "StagedStreams"):
        """Device array of packed per-position values (kernel-layout specific)."""
        fn = self._get_states_fn(st.plan.time_len)
        return fn(self._classmap_dev, self._table_dev, st.streams_dev)

    def _pk_states(self, pk_np: np.ndarray) -> np.ndarray:
        """Recover entered-state ids from emitted packed values (host side)."""
        return (pk_np & self.comp.state_mask) // self.comp.k

    def final_states_staged(self, st: StagedStreams) -> np.ndarray:
        plan, warm = st.plan, st.warm_np
        n = plan.n
        packed_ts = np.asarray(self._states_call(st))
        states_ts = self._pk_states(packed_ts)
        out = np.empty(n, dtype=np.int32)
        L = plan.emit_len
        for i in range(plan.n_streams):
            emit_begin = i * L
            if emit_begin >= n:
                break
            emit_end = min(emit_begin + L, n)
            out[emit_begin:emit_end] = states_ts[warm[i] : warm[i] + (emit_end - emit_begin), i]
        return out

    def final_states(self, text: utf8.TextLike) -> np.ndarray:
        data = utf8.to_u8(text)
        if len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        return self.final_states_staged(self.stage(data))

    # -- on-device match extraction ----------------------------------------

    def _get_extract_fn(self, T: int, cap: int):
        key = ("extract", T, cap)
        if key not in self._count_fn:
            S = self.S

            state_bits = self._count_shift

            @jax.jit
            def ex(packed_ts, warm_s, vend_s, L):
                # Hit mask from the packed per-position values: count rides
                # in the high bits, so no big state->count gather is needed.
                cnt = packed_ts >> state_bits
                tg = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
                valid = (tg >= warm_s[None, :]) & (tg < vend_s[None, :])
                mask = (cnt > 0) & valid
                flat = mask.reshape(-1)
                n_hits = jnp.sum(flat, dtype=jnp.int32)
                (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
                t = (idx // S).astype(jnp.int64)
                st = (idx % S).astype(jnp.int64)
                pos = st * L + (t - warm_s[st].astype(jnp.int64)) + 1
                pk = packed_ts.reshape(-1)[idx]
                return pos, pk, n_hits

            self._count_fn[key] = ex
        return self._count_fn[key]

    def match_positions_staged(self, st: StagedStreams):
        """(global end positions ascending, state ids) without reading the
        full per-position state array back to the host.

        The states kernel leaves packed values in device HBM; a jitted
        compaction (mask -> fixed-capacity nonzero) returns only the hits.
        Capacity grows geometrically on overflow (count_staged bounds it
        from above on the first try).
        """
        plan = st.plan
        packed = self._states_call(st)
        warm_s = jnp.asarray(st.warm_np)
        vend_s = st.vend_t.reshape(-1)
        cap = 1 << max(12, int(np.ceil(np.log2(self.count_staged(st) + 64))))
        cap = min(cap, plan.time_len * self.S)
        while True:
            ex = self._get_extract_fn(plan.time_len, cap)
            pos, pk, n_hits = ex(packed, warm_s, vend_s, plan.emit_len)
            n = int(n_hits)
            if n <= cap:
                break
            cap = 1 << int(np.ceil(np.log2(n + 1)))
        pos = np.asarray(pos[:n], dtype=np.int64)
        pk = np.asarray(pk[:n])
        states = self._pk_states(pk).astype(np.int64)
        order = np.argsort(pos, kind="stable")
        return pos[order], states[order]

    def matches_arrays(self, text: utf8.TextLike) -> Tuple[np.ndarray, np.ndarray]:
        """(ends, value_ids) in reference emission order, device-extracted."""
        data = utf8.to_u8(text)
        if len(data) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        return self.matches_arrays_staged(self.stage(data))

    def matches_arrays_staged(self, st: StagedStreams) -> Tuple[np.ndarray, np.ndarray]:
        pos, states = self.match_positions_staged(st)
        return _expand_outputs(self.machine, pos, states)


def _expand_outputs(machine: AcMachine, pos: np.ndarray, states: np.ndarray):
    """CSR-expand per-hit states into (ends, value_ids), emission order."""
    if len(pos) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    counts = machine.match_count[states]
    ends = np.repeat(pos, counts)
    offs = machine.out_offset[states]
    total = int(counts.sum())
    base = np.repeat(offs, counts)
    ramp = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    value_ids = machine.out_values[base + ramp]
    return ends.astype(np.int64), value_ids.astype(np.int32)


__all__ = [
    "PallasAcEngine",
    "StagedStreams",
    "CompressedMachine",
    "CapacityError",
    "MAX_ROWS",
]


# ---------------------------------------------------------------------------
# Match-bitmap kernels (in-kernel compaction support)
# ---------------------------------------------------------------------------


def make_matchbits_kernel(T_TILE, R, step_factory, n_tiles):
    """Counts + 1-bit-per-position hit bitmap in ONE scan.

    The packed-states extraction path writes 4 B per input byte to HBM and
    re-reads it to compact; this kernel writes ``1/8`` B per byte instead
    (32 positions per int32 word) — hit positions come back sparse via a
    word-level nonzero, and hit STATES are re-derived exactly from the raw
    bytes (AC states depend on at most ``max_needle_bytes`` of history, so a
    from-root replay of that window is exact).

    ``step_factory(refs) -> (carry0, step)`` adapts the kernel to a table
    family: ``step(carry, byte_rc) -> (carry, cnt)`` is one transition over
    [R, 128] lanes.  The time loop is fixed at 32 steps per body (one bitmap
    word), so ``T_TILE % 32 == 0`` is required.

    Bits are set for every scan hit including warm-up overlap duplicates
    and (for non-zero-inert machines) pad bytes; the host filters by each
    stream's [warm, vend) when expanding.  The counts output carries the
    usual boundary masking and IS exact.
    """
    assert T_TILE % 32 == 0

    def kernel(bscal_ref, *rest):
        # rest = (*table_refs, warm_ref, vend_ref, streams_ref,
        #         counts_out, bits_out, carry_scr..., count_scr)
        table_refs = rest[:-7]
        warm_ref, vend_ref, streams_ref, counts_out, bits_out, carry_scr, count_scr = rest[-7:]
        tile = pl.program_id(0)

        carry0, step = step_factory(table_refs, R)

        @pl.when(tile == 0)
        def _init():
            carry_scr[:] = carry0
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tile * T_TILE

        def make_body(masked):
            def body(w, carry_counts):
                carry, counts = carry_counts
                bmp = jnp.zeros((R, 128), jnp.int32)
                for j in range(32):
                    t = w * 32 + j
                    byte_rc = streams_ref[t].astype(jnp.int32)
                    carry, cnt = step(carry, byte_rc)
                    bmp = bmp | jnp.where(cnt > 0, jnp.int32(1) << j, 0)
                    if masked:
                        tg = t0 + t
                        cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
                    counts = counts + cnt
                bits_out[w] = bmp
                return carry, counts

            return body

        is_boundary = (t0 < bscal_ref[0]) | (t0 + T_TILE > bscal_ref[1])
        carry, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // 32, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // 32, make_body(False), c),
            (carry_scr[:], count_scr[:]),
        )
        carry_scr[:] = carry
        count_scr[:] = counts

        @pl.when(tile == n_tiles - 1)
        def _fin():
            counts_out[:] = count_scr[:]

    return kernel


def _expand_hit_bits_native(t_words, s_idx, wvals, warm, vend, L):
    """Threaded C++ bit expansion (am_expand_hit_bits); None when the
    native library is unavailable (numpy fallback in expand_hit_bits)."""
    lib = utf8._native_lib()  # failure-cached: one probe per process
    if lib is None:
        return None
    from ..native.cpp_engine import _default_threads

    tw = np.ascontiguousarray(t_words, dtype=np.int64)
    si = np.ascontiguousarray(s_idx, dtype=np.int64)
    wv = np.ascontiguousarray(
        np.asarray(wvals).astype(np.int64) & 0xFFFFFFFF, dtype=np.uint32
    )
    warm64 = np.ascontiguousarray(warm, dtype=np.int64)
    vend64 = np.ascontiguousarray(vend, dtype=np.int64)
    try:
        budget = int(np.bitwise_count(wv).sum())  # numpy >= 2.0
    except AttributeError:  # pragma: no cover - numpy 1.x
        budget = int(
            np.unpackbits(wv.view(np.uint8)).sum()
        )
    out = np.empty(budget, dtype=np.int64)
    n = int(
        lib.am_expand_hit_bits(
            tw.ctypes.data, si.ctypes.data, wv.ctypes.data, len(wv),
            warm64.ctypes.data, vend64.ctypes.data,
            0, int(L), out.ctypes.data, _default_threads(),
        )
    )
    return out[:n]


def _states_at_native(machine, data: np.ndarray, pos: np.ndarray, W: int):
    """Threaded C++ replay (am_states_at) — ~10x the numpy gather loop at
    millions of positions (the hit-dense extraction's dominant host stage).
    None when the native library is unavailable."""
    lib = utf8._native_lib()  # failure-cached: one probe per process
    if lib is None:
        return None
    from ..native.cpp_engine import _default_threads

    delta = np.ascontiguousarray(machine.delta, dtype=np.int32)  # no-op copy
    # in practice: ac.build emits int32 C-contiguous tables
    data = np.ascontiguousarray(data, dtype=np.uint8)
    pos64 = np.ascontiguousarray(pos, dtype=np.int64)
    out = np.empty(len(pos64), dtype=np.int32)
    lib.am_states_at(
        delta.ctypes.data, data.ctypes.data, len(data),
        pos64.ctypes.data, len(pos64), int(W),
        out.ctypes.data, _default_threads(),
    )
    return out.astype(np.int64)


def states_at_positions(machine, data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Entered state at each end position, re-derived from the raw bytes.

    Exact by the automaton's synchronization property: the state after any
    byte equals the longest needle-prefix suffix of the input, whose length
    is at most ``max_needle_bytes`` — so a from-root replay of the last
    ``max_needle_bytes`` bytes lands on the true state (from-start replays
    are trivially exact for shorter prefixes).  Vectorized across positions:
    W flat-gather steps into the dense delta (W = max needle bytes).
    """
    if len(pos) == 0:
        return np.zeros(0, dtype=np.int64)
    W = max(1, machine.max_needle_bytes)
    native = _states_at_native(machine, data, pos, W)
    if native is not None:
        return native
    flat = machine.delta.reshape(-1)  # view (C-contiguous)
    starts = np.asarray(pos, dtype=np.int64) - W
    # int64 flat indices only when the table could overflow int32 space.
    idt = np.int64 if machine.delta.size > (1 << 31) - 256 else np.int32
    states = np.zeros(len(pos), dtype=idt)
    for j in range(W):
        idx = starts + j
        valid = idx >= 0
        b = data[np.where(valid, idx, 0)].astype(idt)
        nxt = np.take(flat, states * 256 + b)
        states = np.where(valid, nxt.astype(idt), states)
    return states.astype(np.int64)


def expand_hit_bits(t_words, s_idx, wvals, warm, vend, L):
    """Global end positions from sparse bitmap words: word ``i`` covers
    time steps ``[32*t_words[i], 32*t_words[i]+32)`` of stream ``s_idx[i]``;
    bits outside each stream's ``[warm, vend)`` (warm-up duplicates, pad
    scans) are dropped; positions re-base to corpus coordinates
    (``s * L + (t - warm) + 1``).  Shared by the single-chip bitmap
    extraction and the mesh bitmap path (``parallel.shard``).

    Bit expansion runs through the threaded native loop (am_expand_hit_bits)
    when available, else ``np.unpackbits`` on the little-endian byte view
    (bit ``j`` of a word == bit ``j & 7`` of byte ``j >> 3``) — the (n, 32)
    broadcast these replaced allocated 32x the words and dominated
    extraction wall time at high hit density."""
    if len(wvals) == 0:
        return np.zeros(0, dtype=np.int64)
    native = _expand_hit_bits_native(t_words, s_idx, wvals, warm, vend, L)
    if native is not None:
        return native
    wbytes = (np.asarray(wvals, dtype=np.int64) & 0xFFFFFFFF).astype("<u4").view(np.uint8)
    j = np.flatnonzero(np.unpackbits(wbytes, bitorder="little"))
    wi = j >> 5
    t = t_words[wi] * 32 + (j & 31)
    s = s_idx[wi]
    keep = (t >= warm[s]) & (t < vend[s])
    t, s = t[keep], s[keep]
    return s * L + (t - warm[s]) + 1


def dense_bits_step_factory(
    rows, packing, in_range, fold, wpairs, interpret, state_bits, state_mask
):
    """Match-bitmap step factory for the dense select-chain table family
    (used by the single-chip engine and, with packing=1 stacked tables, the
    mesh bitmap path): per byte, ``carry = packed & state_mask`` and
    ``cnt = packed >> state_bits``."""

    def step_factory(table_refs, R):
        classmap_ref, table_ref = table_refs
        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        row_bcasts = _broadcast_rows(table_ref[:], rows, R)
        carry0 = jnp.zeros((R, 128), jnp.int32)

        def step(sbase, byte_rc):
            cls = _class_of(byte_rc, cls_rows, fold, wpairs)
            v = _lookup_flat(row_bcasts, sbase + cls, packing, in_range,
                             wrap=interpret and in_range)
            return v & state_mask, v >> state_bits

        return carry0, step

    return step_factory


def _attach_bits_path(cls):
    """Attach the match-bitmap extraction path to PallasAcEngine (defined
    after the class so the module-level kernel helpers exist)."""

    def _bits_tables(self):
        """(device table args, their BlockSpecs, step_factory) for the
        match-bitmap kernel — the dense select-chain family."""
        rows = self.comp.rows
        step_factory = dense_bits_step_factory(
            rows, self.comp.packing, self._in_range, self._fold, self._wpairs,
            self.interpret, self.comp.state_bits, self.comp.state_mask,
        )

        from jax.experimental.pallas import tpu as pltpu
        from jax.experimental import pallas as pl

        specs = (
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        return (self._classmap_dev, self._table_dev), specs, step_factory

    def _get_bits_fn(self, T: int, cap: int, bcap: int = 1 << 12):
        """One dispatch: bits kernel + in-jit TWO-LEVEL word compaction.
        Returns ``(counts [R,128], wwn [2, cap+1] int32)`` where
        ``wwn[:, :cap]`` is (word idx; word bits) and the last column packs
        ``(n, nb)`` — the true nonzero-word and touched-block counts — so
        ONE fetch of ``wwn`` carries data + both retry controls (a measured
        ``int(n)`` sync costs a full ~30 ms relay round trip on its own).

        Two-level because ``jnp.nonzero`` over the full word array is the
        real device cost (~40 ms at 4.3M words, measured): block flags
        (``B=512`` words/block) are nonzero'd first (cheap), only touched
        blocks gather into a ``[bcap, B]`` arena, and the word-level
        nonzero runs over that much smaller arena.  ``nb > bcap`` means
        blocks were dropped — the word data is incomplete and the caller
        MUST retry with a larger ``bcap`` (``n`` itself is always exact:
        it reduces over the full array)."""
        key = ("bits", T, cap, bcap, getattr(self, "_bits_block", 512))
        if key not in self._count_fn:
            bt = self._bits_tables()
            if bt is None:
                return None
            table_args, table_specs, step_factory = bt
            t_tile = self.t_tile
            if t_tile % 32:
                return None
            n_tiles = T // t_tile
            R = self.R
            kernel = make_matchbits_kernel(t_tile, R, step_factory, n_tiles)

            @jax.jit
            def run(bscal, *args):
                *tabs, warm, vend, streams_u8 = args
                streams = streams_u8.reshape(T, R, 128)
                counts, bits = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + list(table_specs)
                    + [
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                        ),
                    ],
                    out_specs=(
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile // 32, R, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((R, 128), jnp.int32),
                        jax.ShapeDtypeStruct((T // 32, R, 128), jnp.int32),
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(bscal, *tabs, warm, vend, streams)
                flat = bits.reshape(-1)
                B = getattr(self, "_bits_block", 512)  # test hook: force the
                # two-level branch on small corpora by shrinking the block
                pad = (-flat.shape[0]) % B
                if pad:
                    flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
                wb = flat.reshape(-1, B)
                nblocks = wb.shape[0]
                nz = wb != 0
                n = jnp.sum(nz, dtype=jnp.int32)  # exact past any cap
                if bcap >= nblocks:
                    # Hit-dense degenerate case: the block gather would copy
                    # the whole array — single-level nonzero is cheaper.
                    nb = jnp.int32(0)
                    (gi,) = jnp.nonzero(flat != 0, size=cap, fill_value=0)
                    gi = gi.astype(jnp.int32)
                    vals = flat[gi]
                else:
                    touched = jnp.any(nz, axis=1)
                    nb = jnp.sum(touched, dtype=jnp.int32)
                    # Fill points at an appended all-zero row so untouched
                    # capacity never re-emits block 0's words.
                    (bi,) = jnp.nonzero(touched, size=bcap, fill_value=nblocks)
                    arena = jnp.concatenate([wb, jnp.zeros((1, B), jnp.int32)])[bi]
                    (j,) = jnp.nonzero(arena.reshape(-1) != 0, size=cap, fill_value=0)
                    # Global word index; rows past n hold garbage the caller
                    # slices off (blocks ascend, words ascend within a
                    # block, so the first n entries ascend globally).
                    gi = bi[j // B].astype(jnp.int32) * B + (j % B).astype(jnp.int32)
                    vals = arena.reshape(-1)[j]
                wwn = jnp.concatenate(
                    [jnp.stack([gi, vals]), jnp.stack([n, nb]).reshape(2, 1)],
                    axis=1,
                )
                return counts, wwn

            self._count_fn[key] = run
        return self._count_fn[key]

    def match_positions_staged_bits(self, st):
        """Bitmap-compacted (positions, states): ~1/32 the HBM write traffic
        of the packed-states path; hit states re-derived from the raw bytes
        (see ``states_at_positions``).  None when unsupported.

        Wall-clock shape on tunneled devices: ONE dispatch (scan + in-jit
        two-level compaction), ONE fetch of the ``[2, cap+1]`` array whose
        last column carries the true (word, block) counts; word AND block
        capacities double independently on overflow, warm-started from the
        last observed counts."""
        if st.data_np is None:
            return None
        S = self.S
        nwords = (st.plan.time_len // 32) * S
        # Capacity rounding: power-of-2 up to 64Ki, then 64Ki multiples —
        # the fetched array is cap-padded, and the tunnel download is the
        # dense-hit bottleneck (a 2^21 cap for n=1.23M words shipped 41%
        # padding; 64Ki quantization caps waste at ~5%).
        def _p2(v):
            v = int(v) + 1
            if v <= (1 << 16):
                return 1 << int(np.ceil(np.log2(v)))
            return -(-v // (1 << 16)) * (1 << 16)

        cap = min(getattr(self, "_bits_cap_hint", 1 << 14), _p2(nwords))
        blk = getattr(self, "_bits_block", 512)
        bcap = min(getattr(self, "_bits_bcap_hint", 1 << 12), _p2(nwords // blk))
        while True:
            fn = self._get_bits_fn(st.plan.time_len, cap, bcap)
            if fn is None:
                return None
            counts, wwn = fn(
                self._bscal_for(st), *self._bits_tables()[0],
                st.warm_t, st.vend_t, st.streams_dev,
            )
            wwn_np = np.asarray(wwn)  # the ONE device->host fetch
            n = int(wwn_np[0, -1])    # true counts, independent of caps
            nb = int(wwn_np[1, -1])
            if n <= cap and nb <= bcap:
                break
            cap = max(cap, _p2(n))
            bcap = max(bcap, _p2(nb))
        self._bits_cap_hint = max(1 << 14, _p2(n))
        self._bits_bcap_hint = max(1 << 12, _p2(nb))
        if n == 0:
            counts_np = np.asarray(counts, dtype=np.int64)
            if st.live_np is not None:
                counts_np = counts_np[st.live_np]
            if int(counts_np.sum()) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
        widx = wwn_np[0, :n].astype(np.int64)
        wval = wwn_np[1, :n]
        # Expand word bits -> positions; filter warm-up overlap + pad bits.
        warm = st.warm_np.astype(np.int64)
        vend = np.asarray(st.vend_t).reshape(-1).astype(np.int64)
        pos = expand_hit_bits(widx // S, widx % S, wval, warm, vend, st.plan.emit_len)
        states = states_at_positions(self.machine, st.data_np, pos)
        order = np.argsort(pos, kind="stable")
        return pos[order], states[order]

    cls._bits_tables = _bits_tables
    cls._get_bits_fn = _get_bits_fn
    cls.match_positions_staged_bits = match_positions_staged_bits

    orig = cls.match_positions_staged

    def match_positions_staged(self, st):
        got = self.match_positions_staged_bits(st)
        if got is not None:
            return got
        return orig(self, st)

    cls.match_positions_staged = match_positions_staged


_attach_bits_path(PallasAcEngine)
