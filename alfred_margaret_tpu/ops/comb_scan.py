"""Comb-compressed (row-displacement) Pallas engine for mid-tier automata.

The dense select-chain kernel (``pallas_scan.py``) costs one gather per 128
packed table entries per byte, so throughput falls as ``~165/rows`` GB/s and
mid-size automata (100-3000 needles) crawl.  But a DFA-ized Aho-Corasick
table is highly redundant: ``delta(s, c) == delta(fail(s), c)`` for every
class ``c`` that is not a trie edge of ``s`` (the reference materializes
exactly this redundancy as inline wildcard fallback transitions,
``src/Data/Text/AhoCorasick/Automaton.hs:186-192``).  This module exploits it
with the classic *row displacement* scheme (yacc tables / double-array
tries), reshaped for the TPU's 128-lane ``dynamic_gather``:

* **D default rows** (``def_table``): a small set of cluster-center states
  (root + the most popular failure targets) stored dense, ``D * k`` entries.
* **Comb array**: only the *exceptions* — (state, class) pairs whose packed
  entry differs from the state's assigned default row — placed at
  ``comb[base[s] + c]`` by first-fit, slots interleaved across states.
* **Exact truncated owner check**: each comb slot stores the low
  ``t = ceil(log2(k+1))`` bits of its owner's base.  Two distinct bases that
  can probe the same slot differ by less than ``k <= 2**t``, so they cannot
  be congruent mod ``2**t`` — the truncated compare is exact, and placement
  needs no cross-state conflict checks at all (only: exception slots free,
  bases unique).

Per byte the lookup is: comb probe (``rows_c`` gathers + select chain) and
default-row probe (``rows_d`` gathers) issued in parallel, then one select by
the owner hit.  Cost ``rows_c + rows_d`` gathers/byte versus the dense
kernel's ``n_states*k/128/packing`` — measured 5-9x fewer rows for 100-3000
random needles.

Entry layout (int32, bit 31 always zero so ``>> 27`` needs no masking)::

    [30..27] match count of the target state   (4 bits, <= 15)
    [26..13+d] owner check: owner base mod 2^t (t = 14 - d bits)
    [13+d-1..13] def_idx of the target state   (d bits, D <= 2^d)
    [12..0]  base of the target state          (13 bits)

States with no exceptions carry out-of-range bases (>= rows_c*128, unique);
a single ``w < M`` compare folds them into guaranteed misses.  Bases are
unique per state, so the emitted packed value identifies the entered state
(``inv_base``) — match extraction works exactly as in the dense engine.
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

BASE_BITS = 13
BASE_MASK = (1 << BASE_BITS) - 1
COUNT_SHIFT = 27
MAX_COUNT = 15  # 4-bit count field


@dataclass
class CombMachine:
    """Row-displacement-compressed automaton arrays (host side)."""

    classmap: np.ndarray  # int32 [256] byte -> class
    comb: np.ndarray  # int32 [rows_c * 128] displaced exception entries
    def_table: np.ndarray  # int32 [rows_d * 128] D dense default rows (D*k used)
    base: np.ndarray  # int32 [n_states] unique base per state
    def_idx: np.ndarray  # int32 [n_states]
    inv_base: np.ndarray  # int32 [1 << BASE_BITS] base -> state (-1 empty)
    n_states: int
    k: int
    D: int
    rows_c: int
    rows_d: int
    owner_bits: int
    def_bits: int
    n_exceptions: int

    @property
    def owner_shift(self) -> int:
        return BASE_BITS + self.def_bits

    @property
    def owner_mask(self) -> int:
        return (1 << self.owner_bits) - 1

    @property
    def def_mask(self) -> int:
        return (1 << self.def_bits) - 1

    @property
    def rows_total(self) -> int:
        return self.rows_c + self.rows_d

    def pack_entry(self, target: np.ndarray, mc: np.ndarray, owner_res) -> np.ndarray:
        return (
            (mc[target].astype(np.int64) << COUNT_SHIFT)
            | (np.asarray(owner_res, dtype=np.int64) << self.owner_shift)
            | (self.def_idx[target].astype(np.int64) << BASE_BITS)
            | self.base[target].astype(np.int64)
        )

    # -- host-side resolution (oracle for tests / build verification) ------

    def resolve_classes(self, states: np.ndarray, classes: np.ndarray):
        """Vectorized one-step resolution: (next_state, count) per element."""
        w = self.base[states].astype(np.int64) + classes
        m = self.rows_c * 128
        v = self.comb[np.minimum(w, m - 1)]
        own_ok = ((v >> self.owner_shift) & self.owner_mask) == (
            self.base[states] & self.owner_mask
        )
        hit = own_ok & (w < m)
        r = self.def_table[self.def_idx[states].astype(np.int64) * self.k + classes]
        pk = np.where(hit, v, r)
        nxt = self.inv_base[pk & BASE_MASK]
        return nxt, pk >> COUNT_SHIFT


def _choose_classes(delta: np.ndarray):
    cols = np.ascontiguousarray(delta.T)
    uniq, inv = np.unique(cols, axis=0, return_inverse=True)
    return uniq.T.astype(np.int64), inv.astype(np.int32)  # comp [S,k], classmap


def _center_candidates(machine, S: int, d_max: int) -> np.ndarray:
    """Default-row candidate states: root first, then the most popular
    failure-link targets (``delta(s,c) == delta(fail(s),c)`` off trie edges,
    so popular fail targets make the best shared default rows)."""
    fail = machine.fail
    if fail is None:
        order = np.arange(S)
    else:
        indeg = np.bincount(np.asarray(fail, dtype=np.int64), minlength=S)
        indeg[0] = 1 << 60
        order = np.argsort(-indeg, kind="stable")
    cand = [0]
    for s in order:
        if int(s) != 0:
            cand.append(int(s))
        if len(cand) >= d_max:
            break
    return np.asarray(cand[:d_max], dtype=np.int64)


def _mism_matrix(comp: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """mism[s, j] = #classes where state s's row differs from candidate j's
    (accumulated class-by-class: small temporaries, ~4x faster than one big
    broadcast)."""
    c32 = comp.astype(np.int32)
    cc = np.ascontiguousarray(c32[cand])  # [C, k]
    S, k = c32.shape
    mm = np.zeros((S, len(cand)), dtype=np.int16)
    for c in range(k):
        mm += c32[:, c : c + 1] != cc[None, :, c]
    return mm


def comb_structure_cost(
    machine,
    d_candidates=(1, 8, 32, 128, 512),
    overhead: float = 1.08,
    max_rows: Optional[int] = None,
):
    """Estimate (rows_total, D, exc) for comb-compressing ``machine`` without
    doing placement — used by the grouped partitioner's budget search.

    Centers are root + the most popular failure targets; each state is
    assigned the center minimizing its exception count (vectorized prefix
    min, so all candidate D values are scored in one pass).  ``max_rows``
    prunes D values whose dense default table alone would blow the budget.
    """
    comp, classmap = _choose_classes(machine.delta)
    S, k = comp.shape
    if k < 1:
        raise CapacityError("degenerate class count")
    owner_bits = max(1, int(np.ceil(np.log2(k + 1))))
    def_bits = 14 - owner_bits
    if def_bits < 0:
        raise CapacityError(f"k={k} leaves no def_idx bits")
    d_max = 1 << def_bits
    ds = sorted(set(min(d, d_max) for d in d_candidates))
    if max_rows is not None:
        ds = [d for d in ds if -(-d * k // 128) < max_rows] or [1]
    cand = _center_candidates(machine, S, ds[-1])
    run_min = np.minimum.accumulate(_mism_matrix(comp, cand), axis=1)
    results = []
    for D in ds:
        D = min(D, len(cand))
        exc = int(run_min[:, D - 1].sum(dtype=np.int64))
        # Physical positions serve double duty (one base AND one exception
        # slot each), so capacity is bounded by the larger of the two
        # demands — exception count, and the number of states needing a
        # unique in-range base (placement achieves ~0.85 density on both).
        s_exc = int((run_min[:, D - 1] > 0).sum())
        need = max(int(exc * overhead), int(s_exc * 1.15))
        rows_c = max(1, -(-need // 128))
        rows_d = -(-D * k // 128)
        results.append((rows_c + rows_d, D, exc))
    results.sort()
    return results[0]


def build_comb(
    machine,
    max_rows_total: int = MAX_ROWS,
    d_candidates=(1, 8, 32, 128, 512),
) -> CombMachine:
    """Build a :class:`CombMachine`; raises :class:`CapacityError` when the
    machine cannot fit ``max_rows_total`` physical rows (callers fall back to
    the dense or grouped engines)."""
    comp, classmap = _choose_classes(machine.delta)
    S, k = comp.shape
    mc = np.asarray(machine.match_count, dtype=np.int64)
    if mc.max(initial=0) > MAX_COUNT:
        raise CapacityError("per-state match count exceeds 4-bit comb field")
    owner_bits = max(1, int(np.ceil(np.log2(k + 1))))
    def_bits = 14 - owner_bits
    if def_bits < 0:
        raise CapacityError(f"k={k} leaves no def_idx bits")

    # --- center choice + per-state default assignment --------------------
    _, D, _ = comb_structure_cost(machine, d_candidates, max_rows=max_rows_total)
    centers = _center_candidates(machine, S, D)
    D = len(centers)
    # def_idx[s] = argmin mismatches against the chosen centers.
    mm = _mism_matrix(comp, centers)
    def_of = mm.argmin(1).astype(np.int32)
    exc_cnt = mm.min(1).astype(np.int64)
    total_exc = int(exc_cnt.sum())

    # --- first-fit placement of exception rows ----------------------------
    m_cap = min(max_rows_total * 128, (1 << BASE_BITS))
    occ = np.zeros(m_cap + k, dtype=bool)  # slack tail simplifies shifts
    base = np.full(S, -1, dtype=np.int32)
    base_used = np.zeros(1 << BASE_BITS, dtype=bool)
    exc_classes: List[Optional[np.ndarray]] = [None] * S
    owners_order = np.argsort(-exc_cnt, kind="stable")
    high_water = 0
    for s in owners_order:
        s = int(s)
        if exc_cnt[s] == 0:
            break
        e = np.nonzero(comp[s] != comp[centers[def_of[s]]])[0]
        exc_classes[s] = e
        bad = np.zeros(m_cap, dtype=bool)
        for c in e:
            bad |= occ[c : c + m_cap]
        bad |= base_used[:m_cap]
        free = np.nonzero(~bad)[0]
        if len(free) == 0:
            raise CapacityError("comb placement overflow")
        b = int(free[0])
        if b + int(e[-1]) >= m_cap:
            raise CapacityError("comb placement overflow")
        base[s] = b
        base_used[b] = True
        occ[b + e] = True
        high_water = max(high_water, b + int(e[-1]) + 1)

    rows_c = max(1, -(-high_water // 128))
    if rows_c > max_rows_total:
        raise CapacityError(f"comb needs {rows_c} rows > budget")
    m_pad = rows_c * 128
    rows_d = -(-D * k // 128)
    if rows_c + rows_d > max_rows_total:
        raise CapacityError(
            f"comb rows {rows_c}+{rows_d} exceed budget {max_rows_total}"
        )

    # Exception-less states: unique out-of-range bases (guaranteed misses
    # via the kernel's ``w < m_pad`` guard).
    next_dummy = (1 << BASE_BITS) - 1
    for s in range(S):
        if base[s] >= 0:
            continue
        while next_dummy >= m_pad and base_used[next_dummy]:
            next_dummy -= 1
        if next_dummy < m_pad:
            raise CapacityError("ran out of dummy base values")
        base[s] = next_dummy
        base_used[next_dummy] = True

    inv_base = np.full(1 << BASE_BITS, -1, dtype=np.int32)
    inv_base[base] = np.arange(S, dtype=np.int32)

    cm = CombMachine(
        classmap=classmap,
        comb=np.zeros(m_pad, dtype=np.int64),  # finalized to int32 below
        def_table=np.zeros(rows_d * 128, dtype=np.int64),
        base=base,
        def_idx=def_of,
        inv_base=inv_base,
        n_states=S,
        k=k,
        D=D,
        rows_c=rows_c,
        rows_d=rows_d,
        owner_bits=owner_bits,
        def_bits=def_bits,
        n_exceptions=total_exc,
    )

    # --- fill entries ------------------------------------------------------
    tmask = cm.owner_mask
    comb = np.zeros(m_pad, dtype=np.int64)
    slot_owner = np.full(m_pad, -1, dtype=np.int64)
    for s in owners_order:
        s = int(s)
        e = exc_classes[s]
        if e is None:
            break
        w = base[s] + e
        comb[w] = cm.pack_entry(comp[s, e], mc, base[s] & tmask)
        slot_owner[w] = base[s]
    # Empty slots: owner residue distinct from every in-window owner base —
    # exists because in-window bases have pairwise-distinct residues and
    # 2**owner_bits >= k + 1.
    empties = np.nonzero(slot_owner < 0)[0]
    for w in empties:
        # Only a base in the probe window (w-k, w] can reach slot w (via
        # class c = w - base); such bases have pairwise-distinct residues
        # mod 2**owner_bits >= k+1, so a free residue always exists.
        lo = max(0, w - k + 1)
        used = {b & tmask for b in range(lo, w + 1) if base_used[b]}
        rho = next(r for r in range(tmask + 1) if r not in used)
        comb[w] = rho << cm.owner_shift
    cm.comb = comb.astype(np.int32)

    dt = np.zeros(rows_d * 128, dtype=np.int64)
    for j, cs in enumerate(centers):
        dt[j * k : (j + 1) * k] = cm.pack_entry(comp[cs], mc, 0)
    cm.def_table = dt.astype(np.int32)

    # --- exhaustive build verification (vectorized, cheap) ----------------
    ss = np.repeat(np.arange(S, dtype=np.int64), k)
    cc = np.tile(np.arange(k, dtype=np.int64), S)
    nxt, cnt = cm.resolve_classes(ss, cc)
    assert (nxt == comp[ss, cc]).all(), "comb resolution mismatch"
    assert (cnt == mc[comp[ss, cc]]).all(), "comb count mismatch"
    return cm


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _comb_lookup(comb_rows_b, def_rows_b, cb, df, cls, C):
    """One transition: comb probe + default probe (independent gather
    chains) selected by the exact truncated owner check.  Returns the packed
    entry of the entered state."""
    w = cb + cls
    lo = w & 127
    hi = w >> 7
    v = None
    for r, row in enumerate(comb_rows_b):
        cand = jnp.take_along_axis(row, lo, axis=1)
        v = cand if v is None else jnp.where(hi == r, cand, v)
    dvi = df * C["k"] + cls
    if C["def_in_range"]:
        r0 = jnp.take_along_axis(def_rows_b[0], dvi, axis=1)
    else:
        dlo = dvi & 127
        dhi = dvi >> 7
        r0 = None
        for r, row in enumerate(def_rows_b):
            cand = jnp.take_along_axis(row, dlo, axis=1)
            r0 = cand if r0 is None else jnp.where(dhi == r, cand, r0)
    hit = ((v >> C["owner_shift"]) & C["owner_mask"]) == (cb & C["owner_mask"])
    hit = hit & (w < C["m_pad"])
    return jnp.where(hit, v, r0)


def _make_comb_count_kernel(
    T_TILE, R, C, n_tiles, unroll, reps, fold=False, wpairs=None
):
    n_grid = n_tiles * reps
    def_mask = C["def_mask"]
    root_base, root_def = C["root_base"], C["root_def"]

    def kernel(
        bscal_ref,  # SMEM [2] int32
        classmap_ref,  # [2, 128] int32
        comb_ref,  # [rows_c, 128] int32
        def_ref,  # [rows_d, 128] int32
        warm_ref,
        vend_ref,
        streams_ref,  # [T_TILE, R, 128] uint8
        out_ref,  # [R, 128] int32 counts
        cb_scr,
        df_scr,
        count_scr,
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            cb_scr[:] = jnp.full((R, 128), root_base, jnp.int32)
            df_scr[:] = jnp.full((R, 128), root_def, jnp.int32)

        @pl.when(tile == 0)
        def _init_count():
            count_scr[:] = jnp.zeros((R, 128), jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_rows_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        def_rows_b = _broadcast_rows(def_ref[:], C["rows_d"], R)
        warm = warm_ref[:]
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                cb, df, counts = carry
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    pk = _comb_lookup(comb_rows_b, def_rows_b, cb, df, cls, C)
                    cb = pk & BASE_MASK
                    df = (pk >> BASE_BITS) & def_mask
                    cnt = pk >> COUNT_SHIFT  # bit 31 is always clear
                    if masked:
                        tg = t0 + t
                        cnt = jnp.where((tg >= warm) & (tg < vend), cnt, 0)
                    counts = counts + cnt
                return cb, df, counts

            return body

        is_boundary = (t0 < bscal_ref[0]) | (t0 + T_TILE > bscal_ref[1])
        cb, df, counts = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            (cb_scr[:], df_scr[:], count_scr[:]),
        )
        cb_scr[:] = cb
        df_scr[:] = df
        count_scr[:] = counts

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = count_scr[:]

    return kernel


def _make_comb_contains_kernel(T_TILE, R, C, n_tiles, unroll, reps, fold=False, wpairs=None):
    """Sticky-table existence kernel: carries (base, def) only; the final
    base equals the absorbing state's base iff any match was seen."""
    n_grid = n_tiles * reps
    def_mask = C["def_mask"]
    root_base, root_def = C["root_base"], C["root_def"]

    def kernel(
        bscal_ref, classmap_ref, comb_ref, def_ref, vend_ref, streams_ref,
        out_ref, cb_scr, df_scr,
    ):
        tile = pl.program_id(0)
        tmod = jax.lax.rem(tile, n_tiles) if reps > 1 else tile

        @pl.when(tmod == 0)
        def _init_state():
            cb_scr[:] = jnp.full((R, 128), root_base, jnp.int32)
            df_scr[:] = jnp.full((R, 128), root_def, jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_rows_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        def_rows_b = _broadcast_rows(def_ref[:], C["rows_d"], R)
        vend = vend_ref[:]
        t0 = tmod * T_TILE

        def make_body(masked):
            def body(u, carry):
                cb, df = carry
                for j in range(unroll):
                    t = u * unroll + j
                    cls = _class_of(
                        streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs
                    )
                    pk = _comb_lookup(comb_rows_b, def_rows_b, cb, df, cls, C)
                    nb = pk & BASE_MASK
                    nd = (pk >> BASE_BITS) & def_mask
                    if masked:
                        live = t0 + t < vend
                        cb = jnp.where(live, nb, cb)
                        df = jnp.where(live, nd, df)
                    else:
                        cb, df = nb, nd
                return cb, df

            return body

        is_boundary = t0 + T_TILE > bscal_ref[1]
        cb, df = jax.lax.cond(
            is_boundary,
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(True), c),
            lambda c: jax.lax.fori_loop(0, T_TILE // unroll, make_body(False), c),
            (cb_scr[:], df_scr[:]),
        )
        cb_scr[:] = cb
        df_scr[:] = df

        @pl.when(tile == n_grid - 1)
        def _fin():
            out_ref[:] = cb_scr[:]

    return kernel


def _make_comb_states_kernel(T_TILE, R, C, unroll, fold=False, wpairs=None):
    """Emits the packed entry per position (counts in bits 30..27, entered
    state recoverable host-side via ``inv_base[pk & BASE_MASK]``)."""
    def_mask = C["def_mask"]
    root_base, root_def = C["root_base"], C["root_def"]

    def kernel(classmap_ref, comb_ref, def_ref, streams_ref, out_ref, cb_scr, df_scr):
        tile = pl.program_id(0)

        @pl.when(tile == 0)
        def _init():
            cb_scr[:] = jnp.full((R, 128), root_base, jnp.int32)
            df_scr[:] = jnp.full((R, 128), root_def, jnp.int32)

        cls_rows = _broadcast_rows(classmap_ref[:], 2, R)
        comb_rows_b = _broadcast_rows(comb_ref[:], C["rows_c"], R)
        def_rows_b = _broadcast_rows(def_ref[:], C["rows_d"], R)

        def body(u, carry):
            cb, df = carry
            for j in range(unroll):
                t = u * unroll + j
                cls = _class_of(streams_ref[t].astype(jnp.int32), cls_rows, fold, wpairs)
                pk = _comb_lookup(comb_rows_b, def_rows_b, cb, df, cls, C)
                out_ref[t] = pk
                cb = pk & BASE_MASK
                df = (pk >> BASE_BITS) & def_mask
            return cb, df

        cb, df = jax.lax.fori_loop(0, T_TILE // unroll, body, (cb_scr[:], df_scr[:]))
        cb_scr[:] = cb
        df_scr[:] = df

    return kernel


class CombPallasAcEngine(PallasAcEngine):
    """Drop-in Pallas engine over the comb-compressed representation.

    Same public surface as :class:`PallasAcEngine` (stage / count / contains
    / final_states / match extraction); only the kernel internals differ.
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
        comb: Optional[CombMachine] = None,
    ):
        if n_streams % 128:
            raise ValueError("n_streams must be a multiple of 128")
        self.machine = machine
        # Count/contains kernels run on a count-minimized quotient machine
        # (see models/minimize.py and comb16_scan's identical split); the
        # states/extraction path lazily builds tables for the FULL machine.
        if comb is not None:
            self.comb = comb
            self._comb_full: Optional[CombMachine] = comb
        else:
            from ..models.minimize import count_minimized

            # Both table sets build eagerly so a full-machine capacity
            # overflow fails at construction (where the engine ladder and
            # the grouped split-and-retry can fall back), never at the
            # first states-path query.
            self._comb_full = build_comb(machine, max_rows)
            mmin = count_minimized(machine)
            if mmin is machine:
                self.comb = self._comb_full
            else:
                try:
                    self.comb = build_comb(mmin, max_rows)
                except CapacityError:
                    self.comb = self._comb_full
        if unroll is None:
            rt = self.comb.rows_total
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
        (self._fold, self._wpairs, self._classmap_dev, self._comb_dev,
         self._def_dev) = self._make_tables(self.comb)
        self._full_devs = None  # lazy device upload for the states path
        self._count_fn = {}
        self._states_fn = {}
        self.max_rows = max_rows
        self._contains_state = None
        self._count_shift = COUNT_SHIFT

    @staticmethod
    def _make_tables(comb: CombMachine):
        """(fold, wpairs, classmap_dev, comb_dev, def_dev) for one table
        set (count/states/sticky share this recipe)."""
        cm256 = np.zeros(256, dtype=np.int32)
        cm256[: len(comb.classmap)] = comb.classmap
        return (
            bool((cm256[127:] == cm256[127]).all()),
            _classmap_wpairs(cm256),
            jnp.asarray(cm256.reshape(2, 128)),
            jnp.asarray(comb.comb.reshape(comb.rows_c, 128)),
            jnp.asarray(comb.def_table.reshape(comb.rows_d, 128)),
        )

    def _consts(self, cm: CombMachine) -> dict:
        return dict(
            k=cm.k,
            rows_c=cm.rows_c,
            rows_d=cm.rows_d,
            owner_shift=cm.owner_shift,
            owner_mask=cm.owner_mask,
            def_mask=cm.def_mask,
            m_pad=cm.rows_c * 128,
            def_in_range=cm.D * cm.k <= 128,
            root_base=int(cm.base[0]),
            root_def=int(cm.def_idx[0]),
        )

    # -- counting -----------------------------------------------------------

    def _get_count_fn(self, T: int, reps: int = 1):
        key = (T, reps)
        if key not in self._count_fn:
            n_tiles = T // self.t_tile
            C = self._consts(self.comb)
            kernel = _make_comb_count_kernel(
                self.t_tile, self.R, C, n_tiles, self.unroll, reps,
                fold=self._fold, wpairs=self._wpairs,
            )
            R, t_tile = self.R, self.t_tile
            rows_c, rows_d = C["rows_c"], C["rows_d"]

            @jax.jit
            def run(bscal, classmap, comb, deft, warm, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_d, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(bscal, classmap, comb, deft, warm, vend, streams)

            self._count_fn[key] = run
        return self._count_fn[key]

    def count_staged(self, st, reps: int = 1) -> int:
        fn = self._get_count_fn(st.plan.time_len, reps)
        counts = fn(
            self._bscal_for(st), self._classmap_dev, self._comb_dev, self._def_dev,
            st.warm_t, st.vend_t, st.streams_dev,
        )
        counts = np.asarray(counts, dtype=np.int64)
        if st.live_np is not None:
            counts = counts[st.live_np]
        return int(counts.sum())

    # -- existence (sticky) -------------------------------------------------

    def _sticky_setup(self) -> dict:
        if self._contains_state is None:
            from ..models.minimize import count_minimized, minimize_sticky

            # Sticky redirection depends only on match_count > 0, which the
            # count quotient preserves — so start from the (memoized)
            # minimized machine and quotient the much smaller view.
            sv = minimize_sticky(_StickyView(count_minimized(self.machine)))
            # Sticky views get the global row capacity (see comb16's
            # _sticky_setup): the caller's budget sized the COUNT tables.
            comb = build_comb(sv, max(self.max_rows, MAX_ROWS))
            fold, wpairs, cm_dev, comb_dev, def_dev = self._make_tables(comb)
            self._contains_state = dict(
                comb=comb,
                fold=fold,
                wpairs=wpairs,
                absorb_base=int(comb.base[sv.absorb]),
                cm=cm_dev,
                comb_dev=comb_dev,
                def_dev=def_dev,
                fns={},
            )
        return self._contains_state

    def _get_contains_fn(self, T: int, reps: int = 1):
        c = self._sticky_setup()
        key = (T, reps)
        if key not in c["fns"]:
            cm = c["comb"]
            C = self._consts(cm)
            n_tiles = T // self.t_tile
            rt = cm.rows_total
            unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), self.t_tile)
            kernel = _make_comb_contains_kernel(
                self.t_tile, self.R, C, n_tiles, unroll, reps,
                fold=c["fold"], wpairs=c["wpairs"],
            )
            R, t_tile = self.R, self.t_tile
            rows_c, rows_d = C["rows_c"], C["rows_d"]

            @jax.jit
            def run(bscal, classmap, comb, deft, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles * reps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_d, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
                )(bscal, classmap, comb, deft, vend, streams)

            c["fns"][key] = run
        return c["fns"][key]

    def contains_staged(self, st, reps: int = 1) -> bool:
        c = self._sticky_setup()
        fn = self._get_contains_fn(st.plan.time_len, reps)
        out = np.asarray(
            fn(self._bscal_for(st), c["cm"], c["comb_dev"], c["def_dev"], st.vend_t, st.streams_dev)
        )
        if st.live_np is not None:
            out = out[st.live_np]
        return bool((out == c["absorb_base"]).any())

    # -- per-position states -------------------------------------------------

    def _full_set(self):
        """(comb, tables) for the FULL machine — the states/extraction path
        needs real state ids.  Device upload is lazy; the placement itself
        was validated eagerly in ``__init__``."""
        if self._full_devs is None:
            cf = self._comb_full
            self._full_devs = (
                (self._fold, self._wpairs, self._classmap_dev,
                 self._comb_dev, self._def_dev)
                if cf is self.comb
                else self._make_tables(cf)
            )
        return self._comb_full, self._full_devs

    def _get_states_fn(self, T: int):
        key = T
        if key not in self._states_fn:
            combf, (fold, wpairs, _, _, _) = self._full_set()
            t_tile = self._states_t_tile()
            n_tiles = T // t_tile
            unroll = _fit_unroll(self.unroll, t_tile)
            C = self._consts(combf)
            kernel = _make_comb_states_kernel(
                t_tile, self.R, C, unroll, fold=fold, wpairs=wpairs
            )
            R, S = self.R, self.S
            rows_c, rows_d = C["rows_c"], C["rows_d"]

            @jax.jit
            def run(classmap, comb, deft, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                return pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_d, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (t_tile, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((T, R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=self.interpret,
                )(classmap, comb, deft, streams).reshape(T, S)

            self._states_fn[key] = run
        return self._states_fn[key]

    def _states_call(self, st):
        fn = self._get_states_fn(st.plan.time_len)
        _, (_, _, cm_dev, comb_dev, def_dev) = self._full_set()
        return fn(cm_dev, comb_dev, def_dev, st.streams_dev)

    def _pk_states(self, pk_np: np.ndarray) -> np.ndarray:
        combf, _ = self._full_set()
        return combf.inv_base[pk_np & BASE_MASK]


def plan_pallas(machine, max_rows: int = MAX_ROWS):
    """Choose the cheapest single-pass representation for ``machine``.

    Returns ``("dense" | "comb" | "comb16", gather_cost)`` where the cost is
    the per-byte table-gather count (the loop's performance currency:
    sustained rate ~ 165 GB/s / gathers); raises :class:`CapacityError` when
    nothing fits ``max_rows`` physical rows (callers go to the needle-grouped
    multi-pass engine).  Dense wins ties (its per-row select is a hair
    cheaper than the comb owner check).

    Each representation is costed on the machine its engine actually scans
    with: the comb engines run their hot count path on the count-minimized
    quotient (``models/minimize.py``), the dense engine on the full machine
    — so the estimates here (used by the grouped partitioner and the
    host-vs-device dispatcher) stay truthful.
    """
    from ..models.minimize import count_minimized
    from .pallas_scan import CompressedMachine

    options = []
    try:
        options.append(("dense", CompressedMachine.from_machine(machine, max_rows).rows))
    except CapacityError:
        pass
    if options and options[0][1] <= 2:
        # No comb representation can beat a <=2-row dense table (comb32
        # needs >= 2 gathers, comb16 >= 4), so skip the quotient refinement
        # entirely — it is a per-state Python loop the adaptive partitioner
        # would otherwise pay on every small trial group.
        return options[0]
    mmin = count_minimized(machine)
    if (
        mmin.delta.shape[0] < (1 << BASE_BITS) - 64
        and int(np.asarray(mmin.match_count).max(initial=0)) <= MAX_COUNT
    ):
        try:
            rt, _, _ = comb_structure_cost(mmin, max_rows=max_rows)
            if rt <= max_rows:
                options.append(("comb", rt))
        except CapacityError:
            pass
    try:
        from .comb16_scan import comb16_structure_cost

        g16, _ = comb16_structure_cost(mmin)
        if g16 <= max_rows:
            options.append(("comb16", g16))
    except CapacityError:
        pass
    if not options:
        raise CapacityError(
            f"automaton ({machine.delta.shape[0]} states) fits neither dense "
            f"nor comb within {max_rows} rows"
        )
    # Stable preference on ties: dense < comb16 < comb (fewer ALU ops per
    # gather in that order).
    rank = {"dense": 0, "comb16": 1, "comb": 2}
    return min(options, key=lambda o: (o[1], rank[o[0]]))


def bitap_word_budget(gcost) -> int:
    """Bitap register-word budget given the ladder's gather cost.

    Paired on-chip crossover (experiments/tpu_bitap_midtier.py,
    2026-08-20): under load bitap runs ~170/V GB/s while the ladder holds
    the 165/gathers law or better (comb g=2: 70-89, g=3: 61-78, comb16
    g=4: 40), so bitap wins only while V <~ 0.9*g — measured: V=2 vs g=2
    1.5x bitap, V=3 vs g=2 0.8-0.93x ladder, V>=4 ladder at every g<=4.
    V<=2 always engages (g=1 single-row dense tables only exist for sets
    that fit one word, and V=1 beats everything 1.5-4.9x).  ``gcost=None``
    (nothing single-pass fits) gets the full budget.
    """
    return 8 if gcost is None else max(2, min(8, 9 * int(gcost) // 10))


_GCOST_UNSET = object()


def plan_bitap_auto(machine: AcMachine, max_rows: int = MAX_ROWS, gcost=_GCOST_UNSET):
    """Bitap layout under the measured gcost crossover budget, or None.

    Shared by the single-chip dispatcher (make_pallas_engine) and the
    mesh inner chooser (parallel.shard) so both apply the same word-budget
    law.  AMT_BITAP=0 disables.  A CI trap word costs one more register
    (measured ~parity vs composed dense at V'=2; keeps the light-load
    upside, bandwidth-bound vs issue-bound).  Callers that already ran
    :func:`plan_pallas` pass its gather cost via ``gcost`` (None = nothing
    fits) so the structure-cost estimation is not paid twice — the
    adaptive grouped partitioner builds an engine per trial group.
    """
    import os

    if os.environ.get("AMT_BITAP") == "0":
        return None
    from .bitap_scan import plan_bitap, plan_bitap_ci

    if gcost is _GCOST_UNSET:
        try:
            _, gcost = plan_pallas(machine, max_rows)
        except CapacityError:
            gcost = None
    budget = bitap_word_budget(gcost)
    lay = plan_bitap(machine, max_words=budget)
    if lay is None and getattr(machine, "composed_ci", False):
        # Composed IgnoreCase machines take the byte-class bitap with
        # the length-changing-unlowering trap guard (ops.bitap_scan).
        lay = plan_bitap_ci(machine, max_words=budget)
    if lay is not None and lay.trap is not None and lay.n_words + 1 > max(
        2, budget
    ):
        lay = None
    return lay


def make_pallas_engine(machine: AcMachine, max_rows: int = MAX_ROWS, **kw):
    """Build the cheapest of the bitap / dense / comb / comb16 Pallas engines.

    Small needle sets whose tracks fit one int32 register take the bitap
    kernel (measured 639 GB/s vs the dense kernel's ~165 GB/s dependent-
    gather floor — ops.bitap_scan); AMT_BITAP=0 disables it.  Below that,
    the structure-cost estimates carry placement-overhead guesses; if actual
    placement overflows, falls back down the ladder (comb16 -> comb ->
    dense) to whatever fits.
    """
    try:
        kind, gcost = plan_pallas(machine, max_rows)
    except CapacityError:
        kind = gcost = None  # nothing single-pass fits; bitap may still
    lay = plan_bitap_auto(machine, max_rows, gcost=gcost)
    if lay is not None:
        from .bitap_scan import BitapAcEngine

        return BitapAcEngine(machine, layout=lay, max_rows=max_rows, **kw)
    if kind is None:
        # Re-derive the CapacityError message for the grouped fallback.
        plan_pallas(machine, max_rows)
    if kind == "comb16":
        from .comb16_scan import Comb16PallasAcEngine

        try:
            return Comb16PallasAcEngine(machine, max_rows=max_rows, **kw)
        except CapacityError:
            kind = "comb"
    if kind == "comb":
        try:
            return CombPallasAcEngine(machine, max_rows=max_rows, **kw)
        except CapacityError:
            return PallasAcEngine(machine, max_rows=max_rows, **kw)
    return PallasAcEngine(machine, max_rows=max_rows, **kw)


__all__ = [
    "CombMachine",
    "CombPallasAcEngine",
    "bitap_word_budget",
    "build_comb",
    "comb_structure_cost",
    "make_pallas_engine",
    "plan_bitap_auto",
    "plan_pallas",
]


def _comb32_no_bits(self):
    """The 32-bit comb engine keeps the packed-states extraction path (its
    mid-tier role is being taken over by comb16, which has the bitmap
    path)."""
    return None


CombPallasAcEngine._bits_tables = _comb32_no_bits
