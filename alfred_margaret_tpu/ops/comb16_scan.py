"""16-bit comb (row-displacement) Pallas engine: the mid-tier workhorse.

The steady scan loop is GATHER-throughput bound (~165 GB/s per gather/byte,
see ``pallas_scan.py`` header and the memory-calibrated law); ALU ops are
nearly free.  The 32-bit comb engine (``comb_scan.py``) costs
``rows_c + rows_d + classmap`` gathers per byte — for a 100-needle machine
~12, i.e. ~14 GB/s.  This module halves the entry width to 16 bits and
restructures the default probe so the same machine costs ~6 gathers:

* **16-bit entries**, two per int32 lane: ``(count:CB | owner:OB | base:BB)``
  with ``CB + OB + BB == 16`` chosen per machine (CB = bits for the max
  per-state match count, OB = 4 or 5 owner-residue bits, BB the base field).
* **Three-tier resolution** replacing the dense default table.  A DFA-ized
  Aho-Corasick row is ``delta(s,c) == delta(fail(s),c)`` off trie edges
  (the reference materializes this as inline wildcard fallbacks,
  ``src/Data/Text/AhoCorasick/Automaton.hs:186-192``), and center rows are in
  turn near-copies of the root row.  So:

      delta(s, c) = comb hit        (state-vs-center exceptions)
                  | aux hit         (center-vs-root exceptions, ~1-2 rows)
                  | root_row[c]     (1 row)

  The center's aux base is derived from the carried state base by one gather
  into a 128-entry segment table (``seg = cb >> (BB-7)``; every 2^(BB-7)
  -position segment of the base space is owned by one center's states).
* **Truncated owner residues with placement constraints**: entries store
  ``base & (2^OB - 1)``; first-fit placement bans any two bases closer than
  ``k`` with equal residues (two bases can probe the same slot only if they
  are within ``k`` of each other), so the check stays exact, and keeps every
  ``k``-window under ``2^OB - 1`` bases so empty slots always have a free
  miss residue.

Per byte: ``rows_c`` comb gathers + 1 segment gather + ``rows_a`` aux
gathers + 1 root gather (+ the gather-free wruns byte->class chain) — ~6 for
100-needle machines, measured law => ~25 GB/s vs 14.

Capacity: every state needs a unique in-range base, so ``n_states`` is
bounded by ``2^BB`` minus placement slack (~800-1500).  Larger machines go
through the grouped engine with comb16 sub-automata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ac import AcMachine
from ..models.minimize import count_minimized, minimize_sticky
from .pallas_scan import (
    MAX_ROWS,
    CapacityError,
    PallasAcEngine,
    _broadcast_rows,
    _class_of,
    _classmap_wpairs,
    _StickyView,
    _fit_unroll,
)
from .comb_scan import _choose_classes, _center_candidates, _mism_matrix


@dataclass
class Comb16Machine:
    """16-bit three-tier comb arrays (host side)."""

    classmap: np.ndarray  # int32 [256] byte -> class
    comb: np.ndarray  # int32 [rows_c * 128] packed 16-bit entry pairs
    aux: np.ndarray  # int32 [rows_a * 128] packed center-exception pairs
    root_row: np.ndarray  # int32 [128] root row, one DIRECT entry per lane
    #                       (k <= 96 entries; no 16-bit extraction needed)
    segtable: np.ndarray  # int32 [128] seg -> aux base of owning center
    base: np.ndarray  # int32 [n_states] unique in-range base per state
    cbase: np.ndarray  # int32 [D] aux base per center
    def_idx: np.ndarray  # int32 [n_states]
    inv_base: np.ndarray  # int32 [2^BB] base -> state (-1 empty)
    n_states: int
    k: int
    D: int
    rows_c: int
    rows_a: int
    CB: int
    OB: int
    BB: int
    n_exceptions: int
    #: Base-range thresholds for counts >= 2: count = count_bit +
    #: sum(base >= r for r in count_ranges).  States are placed in
    #: count-ascending arenas so these are well defined.
    count_ranges: tuple = ()

    @property
    def base_mask(self) -> int:
        return (1 << self.BB) - 1

    @property
    def owner_mask(self) -> int:
        return (1 << self.OB) - 1

    @property
    def count_shift(self) -> int:
        return 16 - self.CB  # count field sits at the top of the entry

    @property
    def rows_total(self) -> int:
        """Gathers per byte (the performance currency): comb rows + segtable
        + aux rows + root row."""
        return self.rows_c + self.rows_a + 2

    def pack_entry(self, target: np.ndarray, mc: np.ndarray, owner_res) -> np.ndarray:
        e = np.asarray(owner_res, dtype=np.int64) << self.BB
        e = e | self.base[target].astype(np.int64)
        if self.CB:
            bit = np.minimum(mc[target].astype(np.int64), 1)
            e = e | (bit << self.count_shift)
        return e

    def count_of_base(self, base) -> np.ndarray:
        """Count of the state with this base, above the count bit (host
        mirror of the kernel's base-range terms)."""
        extra = np.zeros_like(np.asarray(base, dtype=np.int64))
        for r in self.count_ranges:
            extra += np.asarray(base, dtype=np.int64) >= r
        return extra

    # -- host-side one-step resolution (oracle for build verification) -----

    def resolve_classes(self, states: np.ndarray, classes: np.ndarray):
        """(next_state, count) per element, emulating the kernel exactly."""
        b = self.base[states].astype(np.int64)
        w1 = b + classes
        e1 = _unpack16(self.comb, w1)
        hit1 = ((e1 >> self.BB) & self.owner_mask) == (b & self.owner_mask)
        seg = b >> (self.BB - 7)
        cb = self.segtable[seg].astype(np.int64)
        w2 = cb + classes
        e2 = _unpack16(self.aux, w2)
        hit2 = ((e2 >> self.BB) & self.owner_mask) == (cb & self.owner_mask)
        er = self.root_row[classes].astype(np.int64)  # 32-bit direct entries
        e = np.where(hit1, e1, np.where(hit2, e2, er))
        nb = e & self.base_mask
        nxt = self.inv_base[nb]
        if self.CB:
            cnt = ((e >> self.count_shift) & 1) + self.count_of_base(nb)
        else:
            cnt = np.zeros_like(e)
        return nxt, cnt


def _unpack16(words: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Host-side 16-bit entry extraction from packed int32 words."""
    word = words[np.asarray(w, dtype=np.int64) >> 1].astype(np.int64) & 0xFFFFFFFF
    return np.where((w & 1) == 1, word >> 16, word) & 0xFFFF


def _pack16(entries: np.ndarray, n_words: int) -> np.ndarray:
    """Pack an int64 entry array (values < 2^16) into int32 word pairs."""
    flat = np.zeros(n_words * 2, dtype=np.int64)
    flat[: len(entries)] = entries
    out = flat[0::2] | (flat[1::2] << 16)
    return out.astype(np.uint32).view(np.int32)


#: Highest per-state match count comb16 supports.  Counts above 1 don't fit
#: the single entry bit; they are encoded in *base ranges* instead — states
#: with match_count >= c get bases above the segment-aligned boundary R_c,
#: and the kernel adds ``(base >= R_c)`` per extra level (ALU-free on the
#: gather-bound loop).
MAX_COUNT16 = 7


def _field_split(max_count: int, n_states: int):
    """Candidate (CB, OB, BB) ladders, cheapest-space first.  CB is 1 bit at
    most: higher counts ride in base ranges (see ``MAX_COUNT16``)."""
    if max_count > MAX_COUNT16:
        raise CapacityError(f"match count {max_count} exceeds comb16 range encoding")
    CB = 0 if max_count == 0 else 1
    out = []
    for OB in (5, 4):
        BB = 16 - CB - OB
        if BB < 8 or n_states + 8 > (1 << BB):
            continue
        out.append((CB, OB, BB))
    if not out:
        raise CapacityError(f"{n_states} states exceed comb16 base space")
    return out


def comb16_structure_cost(machine, d_candidates=(16, 32, 64, 128)):
    """Estimate (gathers_total, D) without placement — for the grouped
    partitioner's budget search.  Raises CapacityError on hard gates."""
    comp, _ = _choose_classes(machine.delta)
    S, k = comp.shape
    if k > 96:
        raise CapacityError(f"k={k} too wide for comb16 probe windows")
    mc = np.asarray(machine.match_count, dtype=np.int64)
    splits = _field_split(int(mc.max(initial=0)), S)
    cand = _center_candidates(machine, S, max(d_candidates))
    run_min = np.minimum.accumulate(_mism_matrix(comp, cand), axis=1)
    best = None
    for CB, OB, BB in splits:
        for D in d_candidates:
            D = min(D, len(cand))
            exc = int(run_min[:, D - 1].sum(dtype=np.int64))
            # Base density: windows of k positions hold < 2^OB bases (the
            # empty-slot residue guarantee), so usable density caps at
            # (2^OB - 1)/k; slot density via first-fit ~0.8.
            dens = min(0.8, ((1 << OB) - 1) / k)
            need = max(int(exc / 0.8), int(S / dens)) + k
            if need > (1 << BB):
                continue
            rows_c = max(1, -(-need // 256))
            cexc = int((comp[cand[:D]] != comp[0][None, :]).sum())
            rows_a = max(1, -(-int(cexc / 0.8 + D * 2 + k) // 256))
            g = rows_c + rows_a + 2
            if best is None or g < best[0]:
                best = (g, D)
        if best is not None:
            break  # prefer the wider-owner split when it fits at all
    if best is None:
        raise CapacityError("comb16: no D fits the base space")
    return best


def _place(
    space: int,
    k: int,
    OB: int,
    seg_size: int,
    owners: List[tuple],
    max_pos: int,
):
    """First-fit placement of ``(group, exception-classes, count_class)``
    owners into a shared slot/base space with exact truncated-owner-residue
    guarantees.  Owners must be sorted by count_class ascending; each
    count-class arena starts above every lower arena's bases, yielding the
    range boundaries for the base-range count encoding.

    Returns (base_positions, high_water, seg_owner, boundaries) where
    ``boundaries[c]`` is the first base position of count-class c (compare
    threshold).  Raises CapacityError when a base cannot be placed.

    Invariants enforced (soundness of the OB-bit owner check):
      * slots free; base positions unique;
      * no two bases within distance < k share a residue mod 2^OB
        (only such pairs can probe a common slot);
      * every k-window keeps < 2^OB bases, so empty slots always have a
        spare miss residue.
    """
    omask = (1 << OB) - 1
    occ = np.zeros(space + k, dtype=bool)
    is_base = np.zeros(space, dtype=bool)
    banned = np.zeros((1 << OB, space), dtype=bool)  # residue r banned at pos
    wcount = np.zeros(space + k, dtype=np.int16)
    n_segs = -(-space // seg_size)
    seg_owner = np.full(n_segs, -1, dtype=np.int64)
    positions = np.arange(space)
    bases = np.empty(len(owners), dtype=np.int64)
    high = 0
    max_base = -1
    cur_class = 0
    min_pos = 0
    boundaries: dict = {}

    for i, (grp, exc, cclass) in enumerate(owners):
        if cclass != cur_class:
            if cclass < cur_class:
                raise ValueError("owners must be sorted by count_class")
            min_pos = max_base + 1
            boundaries[cclass] = min_pos
            cur_class = cclass
        # Candidate mask: in a segment owned by grp (or ownable), above the
        # arena floor, slot positions free, not already a base, residue not
        # banned by a same-residue base within k.
        segs_ok = (seg_owner == grp) | (seg_owner == -1)
        pos_ok = segs_ok[positions // seg_size]
        bad = is_base.copy()
        for c in exc:
            bad |= occ[c : c + space]
        cand_mask = pos_ok & ~bad
        cand_mask &= ~banned[positions & omask, positions]
        if min_pos:
            cand_mask[:min_pos] = False
        lim = max_pos - (int(exc[-1]) if len(exc) else 0)
        cand = np.nonzero(cand_mask[:lim])[0]
        placed = False
        for b in cand:
            b = int(b)
            if wcount[b : b + k].max(initial=0) >= omask:  # keep < 2^OB per window
                continue
            bases[i] = b
            is_base[b] = True
            occ[b + exc] = True
            # Ban this residue near b for future bases (distance < k).
            lo = max(0, b - k + 1)
            pb = np.arange(lo, min(space, b + k))
            banned[b & omask, pb[(pb & omask) == (b & omask)]] = True
            wcount[b : b + k] += 1
            if seg_owner[b // seg_size] == -1:
                seg_owner[b // seg_size] = grp
            high = max(high, b + (int(exc[-1]) + 1 if len(exc) else 1))
            max_base = max(max_base, b)
            placed = True
            break
        if not placed:
            raise CapacityError("comb16 placement overflow")
    return bases, high, seg_owner, boundaries


def _empty_residues(entries_len: int, k: int, OB: int, bases: np.ndarray):
    """For each slot, a residue distinct from every base that can probe it
    (placement keeps < 2^OB bases per window, so one always exists)."""
    omask = (1 << OB) - 1
    base_res = np.full(entries_len + k, -1, dtype=np.int64)
    base_res[bases] = bases & omask
    out = np.zeros(entries_len, dtype=np.int64)
    for w in range(entries_len):
        lo = max(0, w - k + 1)
        used = set(int(r) for r in base_res[lo : w + 1] if r >= 0)
        out[w] = next(r for r in range(omask + 1) if r not in used)
    return out


def build_comb16(
    machine, max_rows_total: int = MAX_ROWS, split: Optional[tuple] = None
) -> Comb16Machine:
    """Build a :class:`Comb16Machine`; raises :class:`CapacityError` when the
    machine cannot fit (callers fall back to comb32 / dense / grouped).

    ``split`` forces one ``(CB, OB, BB)`` field split instead of the ladder —
    the distributed engine uses this to build UNIFORM table sets across
    needle groups so one kernel serves every shard."""
    comp, classmap = _choose_classes(machine.delta)
    S, k = comp.shape
    if k > 96:
        raise CapacityError(f"k={k} too wide for comb16 probe windows")
    mc = np.asarray(machine.match_count, dtype=np.int64)
    if split is not None:
        CB, OB, BB = split
        if CB + OB + BB != 16 or BB < 8 or S + 8 > (1 << BB):
            raise CapacityError(f"forced split {split} cannot hold {S} states")
        if int(mc.max(initial=0)) > MAX_COUNT16:
            raise CapacityError("match count exceeds comb16 range encoding")
        splits = [split]
    else:
        splits = _field_split(int(mc.max(initial=0)), S)

    _, D = comb16_structure_cost(machine)
    centers = _center_candidates(machine, S, D)
    D = len(centers)
    mm = _mism_matrix(comp, centers)
    def_of = mm.argmin(1).astype(np.int32)
    exc_cnt = mm.min(1).astype(np.int64)
    total_exc = int(exc_cnt.sum())

    last_err = None
    for CB, OB, BB in splits:
        try:
            return _build_with_fields(
                machine, comp, classmap, centers, def_of, exc_cnt, total_exc,
                mc, S, k, D, CB, OB, BB, max_rows_total,
            )
        except CapacityError as e:
            last_err = e
    raise last_err


def _build_with_fields(
    machine, comp, classmap, centers, def_of, exc_cnt, total_exc,
    mc, S, k, D, CB, OB, BB, max_rows_total,
):
    space = 1 << BB
    seg_size = space // 128  # 128-entry segtable, one gather

    # --- main comb: state-vs-center exceptions ----------------------------
    # Count-ascending arenas (count-class = max(0, mc-1)) give the
    # base-range count encoding; within an arena, big-exception owners
    # first (first-fit quality).
    cclass = np.maximum(0, mc - 1)
    order = np.lexsort((np.arange(S), -exc_cnt, cclass))
    owners = []
    exc_classes: List[np.ndarray] = [None] * S
    for s in order:
        s = int(s)
        e = np.nonzero(comp[s] != comp[centers[def_of[s]]])[0]
        exc_classes[s] = e
        owners.append((int(def_of[s]), e, int(cclass[s])))
    max_pos = min(space, max_rows_total * 256) - k
    bases_o, high, seg_owner, _bnds = _place(space, k, OB, seg_size, owners, max_pos)
    base = np.empty(S, dtype=np.int32)
    base[order] = bases_o
    # Rows must cover every probe window (base + k), not just owned slots —
    # the top base's probes can extend past the occupancy high-water.
    rows_c = max(1, -(-max(high, int(base.max(initial=0)) + k) // 256))
    if rows_c + 3 > max_rows_total:
        raise CapacityError(f"comb16 needs {rows_c}+ rows > budget")
    m_pad = rows_c * 256
    # Range thresholds: R_c = min base among states with count >= c (well
    # defined by arena ordering; class gaps inherit the next boundary).
    max_mc = int(mc.max(initial=0))
    count_ranges = []
    for c in range(2, max_mc + 1):
        sel = base[mc >= c]
        count_ranges.append(int(sel.min()))
    count_ranges = tuple(count_ranges)

    # --- aux: center-vs-root exceptions -----------------------------------
    aux_space = 1 << 10
    aux_exc: List[np.ndarray] = []
    for j in range(D):
        aux_exc.append(np.nonzero(comp[centers[j]] != comp[0])[0])
    # Place big centers first (same first-fit quality argument).  All aux
    # owners share one placement group: cbase is found via the segment
    # table, so aux bases have no segment-ownership constraint.
    aorder = sorted(range(D), key=lambda j: -len(aux_exc[j]))
    cb_o, ahigh, _, _ = _place(
        aux_space, k, OB, aux_space, [(0, aux_exc[j], 0) for j in aorder],
        aux_space - k,
    )
    cbase = np.empty(D, dtype=np.int32)
    cbase[aorder] = cb_o
    rows_a = max(1, -(-ahigh // 256))
    a_pad = rows_a * 256
    if int(cbase.max(initial=0)) + k > a_pad:
        # A probe window (cbase + k) may extend past the padded rows — the
        # kernel would read garbage beyond the array (and the build
        # verification below would IndexError instead of falling back).
        rows_a = -(-(int(cbase.max(initial=0)) + k) // 256)
        a_pad = rows_a * 256
    if rows_c + rows_a + 2 > max_rows_total:
        # Exact budget check now that both row counts are final (the
        # rows_c-side early check assumed rows_a == 1).
        raise CapacityError(
            f"comb16 needs {rows_c}+{rows_a}+2 gathers > {max_rows_total} budget"
        )

    mach = Comb16Machine(
        classmap=classmap,
        comb=np.zeros(rows_c * 128, dtype=np.int32),
        aux=np.zeros(rows_a * 128, dtype=np.int32),
        root_row=np.zeros(128, dtype=np.int32),
        segtable=np.zeros(128, dtype=np.int32),
        base=base,
        cbase=cbase,
        def_idx=def_of,
        inv_base=np.full(space, -1, dtype=np.int32),
        n_states=S,
        k=k,
        D=D,
        rows_c=rows_c,
        rows_a=rows_a,
        CB=CB,
        OB=OB,
        BB=BB,
        n_exceptions=total_exc,
        count_ranges=count_ranges,
    )
    mach.inv_base[base] = np.arange(S, dtype=np.int32)
    omask = mach.owner_mask

    # --- fill main comb -----------------------------------------------------
    entries = np.zeros(m_pad, dtype=np.int64)
    slot_owned = np.zeros(m_pad, dtype=bool)
    for s in range(S):
        e = exc_classes[s]
        if len(e) == 0:
            continue
        w = base[s] + e
        entries[w] = mach.pack_entry(comp[s, e], mc, base[s] & omask)
        slot_owned[w] = True
    res = _empty_residues(m_pad, k, OB, np.asarray(base, dtype=np.int64))
    emptyw = np.nonzero(~slot_owned)[0]
    entries[emptyw] = res[emptyw] << BB
    mach.comb = _pack16(entries, rows_c * 128)

    # --- fill aux ------------------------------------------------------------
    a_entries = np.zeros(a_pad, dtype=np.int64)
    a_owned = np.zeros(a_pad, dtype=bool)
    for j in range(D):
        e = aux_exc[j]
        if len(e) == 0:
            continue
        w = cbase[j] + e
        a_entries[w] = mach.pack_entry(comp[centers[j], e], mc, cbase[j] & omask)
        a_owned[w] = True
    ares = _empty_residues(a_pad, k, OB, np.asarray(cbase, dtype=np.int64))
    aemptyw = np.nonzero(~a_owned)[0]
    a_entries[aemptyw] = ares[aemptyw] << BB
    mach.aux = _pack16(a_entries, rows_a * 128)

    # --- root row + segtable -------------------------------------------------
    if k > 128:
        raise CapacityError("root row exceeds one physical row")
    rr = np.zeros(128, dtype=np.int64)
    rr[:k] = mach.pack_entry(comp[0], mc, 0)
    mach.root_row = rr.astype(np.int32)
    seg = np.zeros(128, dtype=np.int32)
    for g in range(128):
        if g < len(seg_owner) and seg_owner[g] >= 0:
            seg[g] = cbase[seg_owner[g]]
        else:
            # Unowned segment: point at the root center's aux base if root is
            # a center (it always is, index 0 of _center_candidates).
            seg[g] = cbase[0]
    mach.segtable = seg

    # --- exhaustive build verification (vectorized) --------------------------
    ss = np.repeat(np.arange(S, dtype=np.int64), k)
    cc = np.tile(np.arange(k, dtype=np.int64), S)
    nxt, cnt = mach.resolve_classes(ss, cc)
    if not (nxt == comp[ss, cc]).all():
        raise CapacityError("comb16 resolution mismatch (build bug)")
    if CB and not (cnt == mc[comp[ss, cc]]).all():
        raise CapacityError("comb16 count mismatch (build bug)")
    return mach

# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


#: Max boundaries for the gather-free root/segment compare chains.
#: MEASURED (experiments/tpu_c16_chains.py, 2026-08-20, paired same-session
#: A/B on the config-2 machine): a 26-boundary root chain made the kernel
#: SLOWER than its 1-row gather (20.6 vs 24.9 GB/s at g=5 vs g=6) — at
#: ~2 vector ops per boundary, ~20 ALU ops cost as much issue bandwidth as
#: one gather, so "ALU is nearly free" only holds for short chains.  The
#: cap keeps chains to the regime where they genuinely win; the wruns
#: classmap chain survives because it replaces a 2-gather+select lookup.
C16_CHAIN_MAX = 10


def _table_chain(vals, thresholds=None):
    """Telescoping ``(init, ((thr_i, delta_i), ...))`` for a small lookup
    table: ``val(x) = init + sum(delta_i for thr_i <= x)``.  ``thresholds``
    maps table index -> comparison-space threshold (identity when None).
    Returns None past :data:`C16_CHAIN_MAX` boundaries."""
    vals = [int(v) for v in vals]
    pairs = []
    for i in range(1, len(vals)):
        if vals[i] != vals[i - 1]:
            thr = i if thresholds is None else int(thresholds[i])
            pairs.append((thr, vals[i] - vals[i - 1]))
    if len(pairs) > C16_CHAIN_MAX:
        return None
    return (vals[0], tuple(pairs))


def _chain_of(x, chain):
    init, pairs = chain
    out = jnp.full(x.shape, init, jnp.int32)
    for thr, d in pairs:
        out = out + jnp.where(x >= thr, jnp.int32(d), jnp.int32(0))
    return out


def _lookup16(comb_rows_b, aux_rows_b, root_b, seg_b, cb, cls, C):
    """One three-tier transition: comb probe, aux probe (center base via the
    segment table), direct root-row fallback.  Returns the 16-bit
    entry with garbage above bit 16 (every downstream field access masks).

    The segment table and root row resolve through gather-free telescoping
    compare chains when their boundary counts fit (``seg_pairs`` /
    ``root_pairs`` — both are off the dependent critical path, and the loop
    is gather-throughput bound), dropping the kernel from
    ``rows_c + rows_a + 2`` gathers per byte to ``rows_c + rows_a``.

    On hardware the lane gather indexes mod 128, so the ``& 127`` clamps are
    skipped outside interpreter mode (measured: garbage high index bits are
    ignored — experiments/tpu_gather_semantics.py)."""
    BB, OM = C["BB"], C["owner_mask"]
    clamp = (lambda x: x & 127) if C["interpret"] else (lambda x: x)
    w1 = cb + cls
    p1 = clamp(w1 >> 1)
    h1 = w1 >> 8
    v1 = None
    for r, row in enumerate(comb_rows_b):
        cand = jnp.take_along_axis(row, p1, axis=1)
        v1 = cand if v1 is None else jnp.where(h1 == r, cand, v1)
    # Parity extract via a variable shift (0 or 16): one vector shift
    # replaces the compare+select chain.  Sign garbage above bit 16 is
    # fine — every downstream field access masks.
    e1 = v1 >> ((w1 & 1) << 4)
    hit1 = ((e1 >> BB) & OM) == (cb & OM)
    if C.get("seg_pairs") is not None:
        cbv = _chain_of(cb, C["seg_pairs"])
    else:
        cbv = jnp.take_along_axis(seg_b, cb >> C["seg_shift"], axis=1)
    w2 = cbv + cls
    p2 = clamp(w2 >> 1)
    h2 = w2 >> 8
    v2 = None
    for r, row in enumerate(aux_rows_b):
        cand = jnp.take_along_axis(row, p2, axis=1)
        v2 = cand if v2 is None else jnp.where(h2 == r, cand, v2)
    e2 = v2 >> ((w2 & 1) << 4)
    hit2 = ((e2 >> BB) & OM) == (cbv & OM)
    if C.get("root_pairs") is not None:
        er = _chain_of(cls, C["root_pairs"])
    else:
        er = jnp.take_along_axis(root_b, cls, axis=1)  # direct 32-bit entries
    return jnp.where(hit1, e1, jnp.where(hit2, e2, er))


def _make_c16_count_kernel(T_TILE, R, C, n_tiles, unroll, reps, fold=False, wpairs=None):
    n_grid = n_tiles * reps
    bmask = (1 << C["BB"]) - 1
    cshift = C["count_shift"]
    ranges = C["count_ranges"]
    root_cb = C["root_cb"]

    def kernel(
        bscal_ref, classmap_ref, comb_ref, aux_ref, rootseg_ref,
        warm_ref, vend_ref, streams_ref, out_ref, cb_scr, count_scr,
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            cb_scr[:] = jnp.full((R, 128), root_cb, jnp.int32)

        @pl.when(tile == 0)
        def _init_count():
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        aux_b = _broadcast_rows(aux_ref[:], C["rows_a"], R)
        root_b = jax.lax.broadcast_in_dim(rootseg_ref[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rootseg_ref[1], (R, 128), (1,))
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                cb, counts = carry
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C)
                    cb = e & bmask
                    if C["CB"]:
                        cnt = (e >> cshift) & 1
                        for rthr in ranges:  # counts >= 2: base-range terms
                            cnt = cnt + jnp.where(cb >= rthr, 1, 0)
                    else:  # machine provably emits nothing
                        cnt = jnp.zeros((R, 128), jnp.int32)
                    if masked:
                        tg = t0 + t
                        cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
                    counts = counts + cnt
                return cb, counts

            return body

        is_boundary = (t0 < bscal_ref[0]) | (t0 + T_TILE > bscal_ref[1])
        cb, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            (cb_scr[:], count_scr[:]),
        )
        cb_scr[:] = cb
        count_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


def _make_c16_count_kernel_dyn(
    T_TILE, R, C, n_tiles, unroll, n_ranges, n_groups=1, reps=1
):
    """Count kernel with PER-GROUP scalars read from SMEM: ``gscal_ref`` =
    int32 ``[n_groups, 1 + n_ranges]`` holding (root_cb, count-range
    thresholds padded with 2^BB sentinels).  Field split (CB/OB/BB) and row
    counts are static and UNIFORM across groups (``build_comb16(split=...)``).

    Two callers:
    * the distributed engine (``n_groups=1``): one kernel serves every
      needle shard under ``shard_map``;
    * the FUSED grouped engine: ``grid = n_groups * n_tiles`` — segment g
      re-reads the staged stream tiles against group g's tables (BlockSpec
      ``index_map i -> (i // n_tiles, ...)`` on the stacked arrays), state
      re-warms per segment, counts accumulate across segments — G needle
      groups in ONE launch instead of G.
    No fold/wpairs (classmaps differ per group).  ``reps`` re-runs the whole
    group-major grid against the resident streams (benchmark amortization,
    same convention as the single-chip kernels — counts come back
    ``reps *`` base)."""
    bmask = (1 << C["BB"]) - 1
    cshift = C["count_shift"]
    n_grid = reps * n_groups * n_tiles

    def kernel(
        bscal_ref, gscal_ref, classmap_ref, comb_ref, aux_ref, rootseg_ref,
        warm_ref, vend_ref, streams_ref, out_ref, cb_scr, count_scr,
    ):
        tile = pl.program_id(0)
        grp = (
            jax.lax.rem(tile // n_tiles, n_groups) if n_groups > 1 else 0
        )  # reps wrap around the group-major segments
        tmod = jax.lax.rem(tile, n_tiles) if (n_groups > 1 or reps > 1) else tile

        @pl.when(tmod == 0)
        def _init():
            cb_scr[:] = jnp.full((R, 128), gscal_ref[grp, 0], jnp.int32)

        @pl.when(tile == 0)
        def _init_counts():
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        def _blk(ref):
            # Fused grouped callers slice stacked [G, ...] tables with a
            # leading block dim of 1; distributed callers pass 2-D blocks.
            return ref[0] if len(ref.shape) == 3 else ref[:]

        cls_rows = _broadcast_rows(_blk(classmap_ref), 2, R)
        comb_b = _broadcast_rows(_blk(comb_ref), C["rows_c"], R)
        aux_b = _broadcast_rows(_blk(aux_ref), C["rows_a"], R)
        rs = _blk(rootseg_ref)
        root_b = jax.lax.broadcast_in_dim(rs[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rs[1], (R, 128), (1,))
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                cb, counts = carry
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(streams_ref[t].astype(jnp.int32), cls_rows, False, None)
                    e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C)
                    cb = e & bmask
                    if C["CB"]:
                        cnt = (e >> cshift) & 1
                        for ri in range(n_ranges):  # sentinel 2^BB => never
                            cnt = cnt + jnp.where(cb >= gscal_ref[grp, 1 + ri], 1, 0)
                    else:
                        cnt = jnp.zeros((R, 128), jnp.int32)
                    if masked:
                        tg = t0 + t
                        cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
                    counts = counts + cnt
                return cb, counts

            return body

        is_boundary = (t0 < bscal_ref[0]) | (t0 + T_TILE > bscal_ref[1])
        cb, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            (cb_scr[:], count_scr[:]),
        )
        cb_scr[:] = cb
        count_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


def _make_c16_contains_kernel_dyn(T_TILE, R, C, n_tiles, unroll, n_groups=1):
    """Sticky existence kernel with PER-GROUP scalars in SMEM: ``gscal_ref``
    = int32 ``[n_groups, >=2]`` holding (root base, absorb base).

    ``n_groups == 1``: the distributed per-shard step — the final carried
    base is written out and compared host-side of the pallas_call.
    ``n_groups > 1``: the FUSED grouped step — grid of ``n_groups * n_tiles``
    group-major segments; at each segment's last tile the absorb comparison
    folds into a sticky hit accumulator, so G groups answer ``containsAny``
    in ONE launch (the output is a hit mask, nonzero anywhere == True)."""
    bmask = (1 << C["BB"]) - 1

    def kernel(
        bscal_ref, gscal_ref, classmap_ref, comb_ref, aux_ref, rootseg_ref,
        vend_ref, streams_ref, out_ref, *scr,
    ):
        # n_groups == 1 (distributed per-shard): one carry scratch, final
        # base written out.  n_groups > 1 (fused grouped): a second sticky
        # hit-mask scratch accumulates per-segment absorb comparisons.
        cb_scr = scr[0]
        hit_scr = scr[1] if n_groups > 1 else None
        tile = pl.program_id(0)
        grp = jax.lax.rem(tile // n_tiles, n_groups) if n_groups > 1 else 0
        tmod = jax.lax.rem(tile, n_tiles) if n_groups > 1 else tile
        n_grid = n_groups * n_tiles

        @pl.when(tmod == 0)
        def _init():
            cb_scr[:] = jnp.full((R, 128), gscal_ref[grp, 0], jnp.int32)

        if n_groups > 1:

            @pl.when(tile == 0)
            def _init_hits():
                hit_scr[:] = jnp.zeros((R, 128), jnp.int32)

        def _blk(ref):
            return ref[0] if len(ref.shape) == 3 else ref[:]

        cls_rows = _broadcast_rows(_blk(classmap_ref), 2, R)
        comb_b = _broadcast_rows(_blk(comb_ref), C["rows_c"], R)
        aux_b = _broadcast_rows(_blk(aux_ref), C["rows_a"], R)
        rs = _blk(rootseg_ref)
        root_b = jax.lax.broadcast_in_dim(rs[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rs[1], (R, 128), (1,))
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, cb):
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(streams_ref[t].astype(jnp.int32), cls_rows, False, None)
                    e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C)
                    nb = e & bmask
                    cb = jnp.where(t0 + t < vend, nb, cb) if masked else nb
                return cb

            return body

        is_boundary = t0 + T_TILE > bscal_ref[1]
        cb = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            cb_scr[:],
        )
        cb_scr[:] = cb

        if n_groups > 1:

            @pl.when(tmod == n_tiles - 1)
            def _segment_hit():
                hit_scr[:] = hit_scr[:] | jnp.where(cb == gscal_ref[grp, 1], 1, 0)

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = hit_scr[:] if n_groups > 1 else cb_scr[:]

    return kernel


def _make_c16_contains_kernel(T_TILE, R, C, n_tiles, unroll, reps, fold=False, wpairs=None):
    """Sticky-table existence kernel over a CB=0 comb16 build: carries the
    base only; the final base equals the absorbing state's base iff any
    match was seen (cf. ``_StickyView``)."""
    n_grid = n_tiles * reps
    bmask = (1 << C["BB"]) - 1
    root_cb = C["root_cb"]

    def kernel(
        bscal_ref, classmap_ref, comb_ref, aux_ref, rootseg_ref,
        vend_ref, streams_ref, out_ref, cb_scr,
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            cb_scr[:] = jnp.full((R, 128), root_cb, jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        aux_b = _broadcast_rows(aux_ref[:], C["rows_a"], R)
        root_b = jax.lax.broadcast_in_dim(rootseg_ref[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rootseg_ref[1], (R, 128), (1,))
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, cb):
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C)
                    nb = e & bmask
                    cb = jnp.where(t0 + t < vend, nb, cb) if masked else nb
                return cb

            return body

        is_boundary = t0 + T_TILE > bscal_ref[1]
        cb = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            cb_scr[:],
        )
        cb_scr[:] = cb

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = cb_scr[:]

    return kernel


def _make_c16_states_kernel(T_TILE, R, C, unroll, fold=False, wpairs=None):
    """Emits the clean 16-bit entry per position (count in the top CB bits,
    entered state recoverable host-side via ``inv_base[pk & base_mask]``)."""
    bmask = (1 << C["BB"]) - 1
    root_cb = C["root_cb"]

    def kernel(classmap_ref, comb_ref, aux_ref, rootseg_ref, streams_ref, out_ref, cb_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            cb_scr[:] = jnp.full((R, 128), root_cb, jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        aux_b = _broadcast_rows(aux_ref[:], C["rows_a"], R)
        root_b = jax.lax.broadcast_in_dim(rootseg_ref[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rootseg_ref[1], (R, 128), (1,))

        def body(u, cb):
            for j in range(unroll):
                t = u * unroll + j
                cls = _class_of(streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs)
                e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C) & 0xFFFF
                out_ref[t] = e
                cb = e & bmask
            return cb

        cb_scr[:] = jax.lax.fori_loop(0, T_TILE // unroll, body, cb_scr[:])

    return kernel


class Comb16PallasAcEngine(PallasAcEngine):
    """Drop-in Pallas engine over the 16-bit three-tier comb representation.

    Same public surface as :class:`PallasAcEngine` (stage / count / contains
    / final_states / match extraction); only the table layout and kernel
    internals differ.
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
        c16: Optional[Comb16Machine] = None,
    ):
        if n_streams % 128:
            raise ValueError("n_streams must be a multiple of 128")
        self.machine = machine
        # Count/contains/bitmap kernels never export state identity, so they
        # run on a count-minimized quotient machine (models/minimize.py) —
        # typically 10-18% fewer states, hence fewer comb rows (= gathers)
        # on boundary-crossing sizes and in the grouped engine.  ``c16``
        # (when passed) is an explicit prebuilt table set for the FULL
        # machine and is used for both paths.
        if c16 is not None:
            self.c16 = c16
            self._c16_full: Optional[Comb16Machine] = c16
        else:
            # Both table sets build eagerly: a machine whose quotient fits but
            # whose full table does not must fail HERE, where the engine
            # ladder (make_pallas_engine) and the grouped split-and-retry can
            # still fall back — not at the first states-path query.
            self._c16_full = build_comb16(machine, max_rows)
            mmin = count_minimized(machine)
            if mmin is machine:
                self.c16 = self._c16_full
            else:
                try:
                    self.c16 = build_comb16(mmin, max_rows)
                except CapacityError:
                    self.c16 = self._c16_full
        if unroll is None:
            rt = self.c16.rows_total
            unroll = 8 if rt <= 8 else (4 if rt <= 16 else 2)
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
        self._tab = self._make_tables(self.c16)
        self._tab_full = self._tab if self._c16_full is self.c16 else None
        (self._fold, self._wpairs, self._classmap_dev, self._comb_dev,
         self._aux_dev, self._rootseg_dev) = self._tab
        self._count_fn = {}
        self._states_fn = {}
        self.max_rows = max_rows
        self._contains_state = None
        self._count_shift = self.c16.count_shift
        # Hit-sparse containsAny screening (ops.filter_scan): a stride-2
        # candidate filter answers no-hit corpora at ~5-10x the comb16
        # sticky rate; candidate fires fall through to the exact scan.
        from .filter_scan import attach_filter

        attach_filter(self, machine)

    @staticmethod
    def _make_tables(c16: Comb16Machine):
        """(fold, wpairs, classmap_dev, comb_dev, aux_dev, rootseg_dev) for
        one table set."""
        cm256 = np.zeros(256, dtype=np.int32)
        cm256[: len(c16.classmap)] = c16.classmap
        return (
            bool((cm256[127:] == cm256[127]).all()),
            _classmap_wpairs(cm256),
            jnp.asarray(cm256.reshape(2, 128)),
            jnp.asarray(c16.comb.reshape(c16.rows_c, 128)),
            jnp.asarray(c16.aux.reshape(c16.rows_a, 128)),
            jnp.asarray(np.stack([c16.root_row, c16.segtable])),
        )

    def _full_set(self):
        """(c16, tables) for the FULL machine — the states/extraction path,
        where packed entries map back to real state ids via ``inv_base``.
        Tables (device uploads) are prepared lazily; the placement itself is
        validated eagerly in ``__init__``."""
        if self._tab_full is None:
            self._tab_full = (
                self._tab if self._c16_full is self.c16
                else self._make_tables(self._c16_full)
            )
        return self._c16_full, self._tab_full

    def _consts(self, cm: Comb16Machine) -> dict:
        import os

        seg_shift = cm.BB - 7
        root_pairs = seg_pairs = None
        if os.environ.get("AMT_C16_CHAINS") != "0":
            # Gather-free root/segment resolution (see _lookup16): the root
            # row over class ids, the segment table over base space (each
            # segment's threshold is its first base position).
            root_pairs = _table_chain(cm.root_row[: cm.k])
            seg_pairs = _table_chain(
                cm.segtable, thresholds=[g << seg_shift for g in range(128)]
            )
        return dict(
            BB=cm.BB,
            CB=cm.CB,
            owner_mask=cm.owner_mask,
            count_shift=cm.count_shift,
            count_ranges=cm.count_ranges,
            seg_shift=seg_shift,
            rows_c=cm.rows_c,
            rows_a=cm.rows_a,
            root_cb=int(cm.base[0]),
            root_pairs=root_pairs,
            seg_pairs=seg_pairs,
            interpret=self.interpret,
        )

    # -- counting -----------------------------------------------------------

    def _get_count_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._count_fn:
            n_tiles = T // self.t_tile
            C = self._consts(self.c16)
            kernel = _make_c16_count_kernel(
                self.t_tile, self.R, C, n_tiles, self.unroll, reps,
                fold=self._fold, wpairs=self._wpairs,
            )
            R, t_tile = self.R, self.t_tile
            rows_c, rows_a = C["rows_c"], C["rows_a"]

            @jax.jit
            def run(bscal, classmap, comb, aux, rootseg, warm, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0),
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
                )(bscal, classmap, comb, aux, rootseg, warm, vend, streams)

            self._count_fn[key] = run
        return self._count_fn[key]

    def count_staged(self, st, reps: int = 1) -> int:
        fn = self._get_count_fn(st.plan.time_len, reps)
        counts = fn(
            self._bscal_for(st), self._classmap_dev, self._comb_dev,
            self._aux_dev, self._rootseg_dev, st.warm_t, st.vend_t, st.streams_dev,
        )
        counts = np.asarray(counts, dtype=np.int64)
        if st.live_np is not None:
            counts = counts[st.live_np]
        return int(counts.sum())

    # -- existence (sticky) -------------------------------------------------

    def _sticky_setup(self) -> dict:
        if self._contains_state is None:
            # Sticky redirection depends only on match_count > 0, which the
            # count quotient preserves — start from the memoized minimized
            # machine and quotient the much smaller view.
            sv = minimize_sticky(_StickyView(count_minimized(self.machine)))
            # The sticky view may need a row or two more than the count
            # machine the caller's budget was sized for; its only hard
            # constraint is the kernel's global row capacity.
            c16 = build_comb16(sv, max(self.max_rows, MAX_ROWS))
            fold, wpairs, cm, comb_dev, aux_dev, rootseg_dev = self._make_tables(c16)
            self._contains_state = dict(
                c16=c16,
                fold=fold,
                wpairs=wpairs,
                absorb_cb=int(c16.base[sv.absorb]),
                cm=cm,
                comb_dev=comb_dev,
                aux_dev=aux_dev,
                rootseg_dev=rootseg_dev,
                fns={},
            )
        return self._contains_state

    def _get_contains_fn(self, T: int, reps: int = 1):
        c = self._sticky_setup()
        key = (T, reps)
        if key not in c["fns"]:
            cm = c["c16"]
            C = self._consts(cm)
            n_tiles = T // self.t_tile
            rt = cm.rows_total
            unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), self.t_tile)
            kernel = _make_c16_contains_kernel(
                self.t_tile, self.R, C, n_tiles, unroll, reps,
                fold=c["fold"], wpairs=c["wpairs"],
            )
            R, t_tile = self.R, self.t_tile
            rows_c, rows_a = C["rows_c"], C["rows_a"]

            @jax.jit
            def run(bscal, classmap, comb, aux, rootseg, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
                    interpret=self.interpret,
                )(bscal, classmap, comb, aux, rootseg, vend, streams)

            c["fns"][key] = run
        return c["fns"][key]

    def contains_staged(self, st, reps: int = 1) -> bool:
        if reps == 1:
            from .filter_scan import filter_contains

            got = filter_contains(self, st)
            if got is not None:
                return got  # exact short-needle hit / no fire anywhere
        c = self._sticky_setup()
        fn = self._get_contains_fn(st.plan.time_len, reps)
        out = np.asarray(
            fn(self._bscal_for(st), c["cm"], c["comb_dev"], c["aux_dev"],
               c["rootseg_dev"], st.vend_t, st.streams_dev)
        )
        if st.live_np is not None:
            out = out[st.live_np]
        return bool((out == c["absorb_cb"]).any())

    # -- per-position states --------------------------------------------------

    def _get_states_fn(self, T: int):
        key = T
        if key not in self._states_fn:
            c16f, tab = self._full_set()
            fold, wpairs = tab[0], tab[1]
            t_tile = self._states_t_tile()
            n_tiles = T // t_tile
            unroll = _fit_unroll(self.unroll, t_tile)
            C = self._consts(c16f)
            kernel = _make_c16_states_kernel(
                t_tile, self.R, C, unroll, fold=fold, wpairs=wpairs
            )
            R, S = self.R, self.S
            rows_c, rows_a = C["rows_c"], C["rows_a"]

            @jax.jit
            def run(classmap, comb, aux, rootseg, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((T, R, 128), jnp.int32),
                    scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
                    interpret=self.interpret,
                )(classmap, comb, aux, rootseg, streams).reshape(T, S)

            self._states_fn[key] = run
        return self._states_fn[key]

    def _states_call(self, st):
        fn = self._get_states_fn(st.plan.time_len)
        _, (_, _, cm_dev, comb_dev, aux_dev, rootseg_dev) = self._full_set()
        return fn(cm_dev, comb_dev, aux_dev, rootseg_dev, st.streams_dev)

    def _pk_states(self, pk_np: np.ndarray) -> np.ndarray:
        c16f, _ = self._full_set()
        return c16f.inv_base[pk_np & c16f.base_mask]


def build_comb16_uniform(machines, max_rows_total: int = MAX_ROWS, split=None):
    """Comb16 table sets for a list of (needle-group) machines with a
    UNIFORM field split and row counts, stacked for the distributed engine:

    Returns ``(c16s, stacked)`` where ``stacked`` is a dict of numpy arrays
    ``classmap [G,2,128]``, ``comb [G,rows_c,128]``, ``aux [G,rows_a,128]``,
    ``rootseg [G,2,128]``, ``gscal [G,1+n_ranges]`` (root_cb + count-range
    thresholds, padded with the 2^BB sentinel), plus the static consts.
    Zero row padding is safe: every group's probes stay inside its own
    padded rows (placement bounds ``base + k`` by its row count).

    ``split`` pins one ``(CB, OB, BB)`` instead of the ladder — callers
    that already partitioned against a forced split (``ops.grouped.
    partition_uniform16``) pass it to skip re-probing the ladder.

    Raises :class:`CapacityError` when no single split fits every group.
    """
    if split is not None:
        CB, OB, BB = split
        c16s = [build_comb16(m, max_rows_total, split=split) for m in machines]
    else:
        CB = 1 if any(int(np.asarray(m.match_count).max(initial=0)) > 0 for m in machines) else 0
        last = None
        for OB in (5, 4):
            BB = 16 - CB - OB
            try:
                c16s = [build_comb16(m, max_rows_total, split=(CB, OB, BB)) for m in machines]
                break
            except CapacityError as e:
                last = e
        else:
            raise last
    G = len(c16s)
    rows_c = max(c.rows_c for c in c16s)
    rows_a = max(c.rows_a for c in c16s)
    n_ranges = max(len(c.count_ranges) for c in c16s)
    sentinel = 1 << BB
    classmap = np.zeros((G, 2, 128), dtype=np.int32)
    comb = np.zeros((G, rows_c, 128), dtype=np.int32)
    aux = np.zeros((G, rows_a, 128), dtype=np.int32)
    rootseg = np.zeros((G, 2, 128), dtype=np.int32)
    gscal = np.full((G, 1 + max(1, n_ranges)), sentinel, dtype=np.int32)
    for g, c in enumerate(c16s):
        cm256 = np.zeros(256, dtype=np.int32)
        cm256[: len(c.classmap)] = c.classmap
        classmap[g] = cm256.reshape(2, 128)
        comb[g, : c.rows_c] = c.comb.reshape(c.rows_c, 128)
        aux[g, : c.rows_a] = c.aux.reshape(c.rows_a, 128)
        rootseg[g] = np.stack([c.root_row, c.segtable])
        gscal[g, 0] = int(c.base[0])
        for ri, thr in enumerate(c.count_ranges):
            gscal[g, 1 + ri] = int(thr)
    consts = dict(
        CB=CB, OB=OB, BB=BB, rows_c=rows_c, rows_a=rows_a,
        n_ranges=max(1, n_ranges) if CB else 0,
        owner_mask=(1 << OB) - 1, count_shift=16 - CB, seg_shift=BB - 7,
    )
    return c16s, dict(
        classmap=classmap, comb=comb, aux=aux, rootseg=rootseg, gscal=gscal,
        consts=consts,
    )


def build_sticky16_uniform(
    machines, max_rows_total: int = MAX_ROWS, split=None, views=None
):
    """Uniform comb16 STICKY tables for a list of machines (the shared
    builder behind the fused grouped containsAny and the distributed sticky
    inner): each machine's absorbing view is count-quotiented, all views
    build with one shared field split, and ``gscal`` holds per-group
    ``(root base, absorb base)`` rows.

    ``views`` passes pre-minimized sticky views (skipping the quotient
    pipeline — ``ops.grouped.partition_uniform16(view="sticky")`` already
    built them); ``split`` pins the field split it validated.

    Returns ``(c16s, stacked)`` like :func:`build_comb16_uniform`; raises
    :class:`CapacityError` when no single split fits every view."""
    svs = (
        views
        if views is not None
        else [minimize_sticky(_StickyView(count_minimized(m))) for m in machines]
    )
    c16s, stacked = build_comb16_uniform(svs, max_rows_total, split=split)
    gscal2 = np.stack(
        [
            stacked["gscal"][:, 0],
            np.asarray(
                [int(c.base[sv.absorb]) for sv, c in zip(svs, c16s)],
                dtype=np.int32,
            ),
        ],
        axis=1,
    ).astype(np.int32)
    stacked = dict(stacked, gscal=gscal2)
    return c16s, stacked


__all__ = [
    "Comb16Machine",
    "Comb16PallasAcEngine",
    "build_comb16",
    "build_comb16_uniform",
    "build_sticky16_uniform",
    "comb16_structure_cost",
]


def _c16_bits_tables(self):
    """Match-bitmap kernel adapter for the 16-bit three-tier comb family
    (see ``pallas_scan.make_matchbits_kernel``)."""
    C = self._consts(self.c16)
    fold, wpairs = self._fold, self._wpairs
    rows_c, rows_a = C["rows_c"], C["rows_a"]
    bmask = (1 << C["BB"]) - 1
    cshift = C["count_shift"]
    ranges = C["count_ranges"]
    root_cb = C["root_cb"]
    CB = C["CB"]

    def step_factory(table_refs, R):
        classmap_ref, comb_ref, aux_ref, rootseg_ref = table_refs
        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_b = _broadcast_rows(comb_ref[:], rows_c, R)
        aux_b = _broadcast_rows(aux_ref[:], rows_a, R)
        root_b = jax.lax.broadcast_in_dim(rootseg_ref[0], (R, 128), (1,))
        seg_b = jax.lax.broadcast_in_dim(rootseg_ref[1], (R, 128), (1,))
        carry0 = jnp.full((R, 128), root_cb, jnp.int32)

        def step(cb, byte_rc):
            cls = _class_of(byte_rc, cls_rows, fold, wpairs)
            e = _lookup16(comb_b, aux_b, root_b, seg_b, cb, cls, C)
            cb2 = e & bmask
            if CB:
                cnt = (e >> cshift) & 1
                for rthr in ranges:
                    cnt = cnt + jnp.where(cb2 >= rthr, 1, 0)
            else:
                cnt = jnp.zeros((R, 128), jnp.int32)
            return cb2, cnt

        return carry0, step

    specs = (
        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    return (
        (self._classmap_dev, self._comb_dev, self._aux_dev, self._rootseg_dev),
        specs,
        step_factory,
    )


Comb16PallasAcEngine._bits_tables = _c16_bits_tables
