"""Needle-grouped multi-pass Pallas engine for large automata.

The VMEM select-chain kernel caps at ``MAX_ROWS * 128`` packed entries
(``pallas_scan.py``).  Bigger needle sets are partitioned into groups whose
sub-automata each fit, and the corpus is scanned once per group on-device.

Semantics are preserved exactly:

* counts and value presence are unions/sums over groups (needle sets are
  disjoint across groups);
* duplicate needles stay in one group, so the reference's payload-merge
  emission order (``Automaton.hs:259-263``) is untouched;
* cross-group match merge orders by ``(end, -needle_byte_len)``: the
  reference emits same-end matches in state-output order, which is own
  (longest) needle first then failure-chain (strictly shorter) suffixes
  (``Automaton.hs:367-380``), and same-end same-length needles are
  byte-identical, hence in the same group.

Group partitioning is greedy over the original needle order, bounded by an
exact state count (incremental trie insertion) times an upper bound on the
byte-class count (distinct bytes + 1), so every group is guaranteed to fit.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..models import ac
from ..utils import utf8
from .pallas_scan import MAX_ROWS, CapacityError, PallasAcEngine


def partition_needles(machine: ac.AcMachine, max_rows: int = MAX_ROWS) -> List[List[int]]:
    """Partition value ids (pair indices) into groups whose sub-automata fit
    ``max_rows * 128`` packed entries. Duplicate needles share a group."""
    budget = max_rows * 128
    groups: List[List[int]] = []
    needle_group: dict = {}

    cur: List[int] = []
    cur_trie: dict = {}
    cur_nodes = 1  # root
    cur_bytes: set = set()

    def close():
        nonlocal cur, cur_trie, cur_nodes, cur_bytes
        if cur:
            groups.append(cur)
        cur, cur_trie, cur_nodes, cur_bytes = [], {}, 1, set()

    def try_add(needle: bytes) -> bool:
        """Insert into the running trie estimate; True if still in budget."""
        nonlocal cur_nodes
        new_nodes = 0
        node = cur_trie
        for b in needle:
            nxt = node.get(b)
            if nxt is None:
                nxt = {}
                node[b] = nxt
                new_nodes += 1
            node = nxt
        cur_nodes += new_nodes
        cur_bytes.update(needle)
        return cur_nodes * (len(cur_bytes) + 1) <= budget

    for vid, needle in enumerate(machine.needles):
        prev = needle_group.get(needle)
        if prev is not None:
            # Duplicate: must join the first occurrence's group (may make
            # that group's estimate stale, but duplicates add no trie nodes
            # or bytes, so the bound is unaffected).
            if prev == -1:
                cur.append(vid)
            else:
                groups[prev].append(vid)
            continue
        single_entries = (len(needle) + 1) * (len(set(needle)) + 1)
        if single_entries > budget:
            raise CapacityError(
                f"needle of {len(needle)} bytes cannot fit a {budget}-entry group"
            )
        if not try_add(needle):
            close()
            # Re-fix group indices for needles closed into the last group.
            for n, g in needle_group.items():
                if g == -1:
                    needle_group[n] = len(groups) - 1
            try_add(needle)
        cur.append(vid)
        needle_group[needle] = -1  # -1 == current open group
    close()
    for n, g in needle_group.items():
        if g == -1:
            needle_group[n] = len(groups) - 1
    return groups


def partition_adaptive(
    machine: ac.AcMachine, max_rows: int = MAX_ROWS, with_rows: bool = False
):
    """Group needles by *exact* sub-machine structure cost, dense or comb.

    Raises :class:`CapacityError` for empty-needle machines: the empty
    needle's matches depend on the union of all groups' states (see the
    engine constructor) — such machines are not needle-partitionable, and
    the dispatcher's cost probe relies on this raise to route them to a
    full-machine engine.

    The entry-bound partitioner above is safe but very conservative: the
    comb representation (``ops.comb_scan``) fits 10-30x more states in the
    same row budget, so sizing groups against ``min(dense, comb)`` cost
    turns a ~100-pass machine into a handful of passes.  Group sizes are
    found by exponential growth + bisection on trial ``ac.build`` +
    structure-cost evaluations (construction stays offline/cheap, matching
    the reference's stance that build time is negligible,
    ``Automaton.hs:24-28``).
    """
    from .comb_scan import plan_pallas

    if any(len(n) == 0 for n in machine.needles):
        raise CapacityError("empty needle cannot be needle-partitioned")
    first: dict = {}
    uniq: List[Tuple[bytes, List[int]]] = []
    for vid, needle in enumerate(machine.needles):
        j = first.get(needle)
        if j is None:
            first[needle] = len(uniq)
            uniq.append((needle, [vid]))
        else:
            uniq[j][1].append(vid)
    N = len(uniq)

    rows_of: dict = {}

    def cost(i: int, g: int):
        """Per-byte gather cost of a [i, i+g) group, or None if nothing fits."""
        if (i, g) not in rows_of:
            sub = ac.build([(uniq[i + j][0], 0) for j in range(g)])
            try:
                _, rows_of[i, g] = plan_pallas(sub, max_rows)
            except CapacityError:
                rows_of[i, g] = None
        return rows_of[i, g]

    groups: List[List[int]] = []
    group_rows: List[int] = []
    i = 0
    while i < N:
        # Grow the group along a geometric ladder while the gather cost PER
        # NEEDLE keeps improving: the scan rate is ~165/total_gathers GB/s,
        # so minimizing sum(cost) == minimizing cost/needle group by group.
        # (Maximizing raw group size would favor large high-cost comb32
        # groups over more, cheaper comb16 groups.)
        g = min(32, N - i)
        c = cost(i, g)
        if c is None:
            # Even the seed size overflows: shrink until something fits.
            g //= 2
            while g >= 1 and cost(i, g) is None:
                g //= 2
            if g == 0:
                raise CapacityError(
                    f"needle {uniq[i][0]!r} alone exceeds the {max_rows}-row budget"
                )
            best_g, best_c = g, cost(i, g)
        else:
            best_g, best_c, best_cpn = g, c, c / g
            while g < N - i:
                g = min(g * 2, N - i)
                c = cost(i, g)
                if c is None:
                    break
                cpn = c / g
                if cpn < best_cpn * 0.98:
                    best_g, best_c, best_cpn = g, c, cpn
                else:
                    break  # diminishing returns: stop growing
            # One midpoint probe: the geometric ladder can step over the
            # comb16 capacity knee (e.g. 96 beats both 64 and 128).
            m = best_g + best_g // 2
            if m <= N - i and m != best_g:
                cm_ = cost(i, m)
                if cm_ is not None and cm_ / m < best_cpn:
                    best_g, best_c = m, cm_
        groups.append([v for _, vids in uniq[i : i + best_g] for v in vids])
        group_rows.append(best_c)
        i += best_g
    if with_rows:
        return groups, group_rows
    return groups


def partition_uniform16(
    machine: ac.AcMachine, max_rows_total: int = MAX_ROWS, view: str = "count"
):
    """Partition value ids into groups that ALL build comb16 under ONE
    shared field split — the precondition of the fused single-launch
    grouped kernels (``_make_c16_count_kernel_dyn``).

    ``partition_adaptive`` sizes groups against the per-group optimum over
    dense/comb32/comb16 with per-group field splits, which routinely
    overflows the *uniform* split ``build_comb16_uniform`` needs (the
    round-2 fused path was dead code on natural needle sets for exactly
    this reason).  This partitioner instead trial-builds every candidate
    group with the forced split, so the subsequent uniform build cannot
    overflow.  Counts and containsAny do not depend on group boundaries
    (sums/unions over disjoint needle sets), so the fused engine is free to
    use this partition even when match extraction uses the adaptive one.

    ``view`` selects the machine the trial builds (and hence the fused
    kernel) will scan: ``"count"`` — the count-minimized quotient (fused
    count); ``"sticky"`` — the absorbing sticky quotient (fused
    containsAny).  The sticky view's comb structure differs from the count
    view's, so a partition validated for one can overflow the other —
    each fused kernel family partitions against its own view.

    Returns ``(groups, subs, subs_min, split)``: vid groups, each group's
    machine, its ``view``-minimized quotient (what the fused kernel
    scans), and the validated ``(CB, OB, BB)`` split.  Raises
    :class:`CapacityError` when some needle fits no uniform split alone.
    """
    from ..models.minimize import count_minimized, minimize_sticky
    from .comb16_scan import build_comb16
    from .pallas_scan import _StickyView

    def quotient(sub: ac.AcMachine):
        mmin = count_minimized(sub)
        if view == "sticky":
            return minimize_sticky(_StickyView(mmin))
        return mmin

    first: dict = {}
    uniq: List[Tuple[bytes, List[int]]] = []
    for vid, needle in enumerate(machine.needles):
        j = first.get(needle)
        if j is None:
            first[needle] = len(uniq)
            uniq.append((needle, [vid]))
        else:
            uniq[j][1].append(vid)
    N = len(uniq)

    cache: dict = {}

    def trial(i: int, g: int, split):
        """(rows, sub, sub_min) for group [i, i+g) under ``split``, or None."""
        key = (i, g, split)
        if key not in cache:
            pairs = [
                (machine.needles[v], machine.values[v])
                for _, vids in uniq[i : i + g]
                for v in vids
            ]
            sub = ac.build(pairs)
            try:
                sub_min = quotient(sub)
                c16 = build_comb16(sub_min, max_rows_total, split=split)
                cache[key] = (c16.rows_c + c16.rows_a + 2, sub, sub_min)
            except CapacityError:
                cache[key] = None
        return cache[key]

    # Count views carry per-state weights (CB=1); sticky views encode hits
    # in the absorbing base alone (CB=0, one more base bit).
    CB = 0 if view == "sticky" else 1
    last_err = None
    for OB in (5, 4):
        split = (CB, OB, 16 - CB - OB)
        groups: List[List[int]] = []
        subs: List[ac.AcMachine] = []
        subs_min: List[ac.AcMachine] = []
        i = 0
        failed = False
        while i < N:
            g = min(32, N - i)
            r = trial(i, g, split)
            if r is None:
                g //= 2
                while g >= 1 and trial(i, g, split) is None:
                    g //= 2
                if g == 0:
                    failed = True
                    break
                best_g, best_r = g, trial(i, g, split)
                best_cpn = best_r[0] / g
            else:
                best_g, best_r, best_cpn = g, r, r[0] / g
                # Same growth policy as partition_adaptive: geometric ladder
                # while rows-per-needle improves, one midpoint probe.
                while g < N - i:
                    g = min(g * 2, N - i)
                    r = trial(i, g, split)
                    if r is None:
                        break
                    cpn = r[0] / g
                    if cpn < best_cpn * 0.98:
                        best_g, best_r, best_cpn = g, r, cpn
                    else:
                        break
                mth = best_g + best_g // 2
                if mth <= N - i and mth != best_g:
                    rm = trial(i, mth, split)
                    if rm is not None and rm[0] / mth < best_cpn:
                        best_g, best_r = mth, rm
            groups.append([v for _, vids in uniq[i : i + best_g] for v in vids])
            subs.append(best_r[1])
            subs_min.append(best_r[2])
            i += best_g
        if not failed:
            return groups, subs, subs_min, split
        last_err = CapacityError(
            f"needle {uniq[i][0]!r} fits no uniform comb16 split alone"
        )
    raise last_err


class GroupedPallasAcEngine:
    """Multi-pass engine: one Pallas scan per needle group.

    Exposes the same count/match surface the dispatcher needs; match
    extraction happens internally (per-group states cannot be merged, only
    the extracted matches can).  Each group runs the cheaper of the dense /
    comb kernels (``ops.comb_scan.make_pallas_engine``).
    """

    def __init__(
        self,
        machine: ac.AcMachine,
        max_rows: int = MAX_ROWS,
        partition: str = "adaptive",
        **pallas_kw,
    ):
        from .comb_scan import make_pallas_engine

        if any(len(n) == 0 for n in machine.needles):
            # The empty needle's root-piggyback quirk fires wherever the
            # FULL machine is non-root (Automaton.hs:367-380 flattening) —
            # the UNION of all groups' non-root states, which per-group
            # count sums cannot express (found by soak trial 32: grouped
            # 896 vs full 929).  Empty-needle machines must run on a
            # full-machine engine (single-pass kernel / XLA / host C++).
            raise CapacityError(
                "empty needle cannot be needle-partitioned: its matches "
                "depend on the union of every group's states"
            )
        self.machine = machine
        self.max_rows = max_rows
        if partition == "adaptive":
            groups = partition_adaptive(machine, max_rows)
        elif partition == "entry":
            groups = partition_needles(machine, max_rows)
        else:
            raise ValueError(f"unknown partition scheme {partition!r}")
        self.groups: List[List[int]] = []
        self.engines: List[PallasAcEngine] = []
        self.vid_maps: List[np.ndarray] = []
        self._fused = False  # built lazily on first count (None = not fusable)
        # All sub-engines share the FULL machine's overlap so one staged
        # stream layout serves every group pass (staging dominates
        # multi-pass cost otherwise).
        overlap = max(0, machine.max_needle_bytes - 1)

        def add_group(vids: List[int]):
            # The adaptive partitioner scores unique value-less needles; the
            # real group (payload merge, placement) can still overflow in
            # rare corners — split and retry preserves correctness.
            pairs = [(machine.needles[v], machine.values[v]) for v in vids]
            sub = ac.build(pairs)
            try:
                eng = make_pallas_engine(
                    sub, max_rows=max_rows, overlap=overlap, **pallas_kw
                )
            except CapacityError:
                if len(vids) == 1:
                    raise
                # Split on first-occurrence boundaries so duplicates stay
                # together (they are adjacent in the vid list only within
                # one needle; regroup by needle identity).
                seen: dict = {}
                per_needle: List[List[int]] = []
                for v in vids:
                    n = machine.needles[v]
                    if n in seen:
                        per_needle[seen[n]].append(v)
                    else:
                        seen[n] = len(per_needle)
                        per_needle.append([v])
                if len(per_needle) == 1:
                    # One unique needle (possibly duplicated vids): cannot
                    # split further — a 50/50 split would recurse forever.
                    raise
                mid = max(1, len(per_needle) // 2)
                add_group([v for g in per_needle[:mid] for v in g])
                add_group([v for g in per_needle[mid:] for v in g])
                return
            self.groups.append(vids)
            self.engines.append(eng)
            self.vid_maps.append(np.asarray(vids, dtype=np.int64))

        for vids in groups:
            add_group(vids)

        # Hit-sparse containsAny screening (ops.filter_scan): one stride-2
        # filter pass over the SHARED staging replaces G sticky passes on
        # no-hit corpora.  The word budget scales with the group count the
        # filter replaces (G sticky scans at ~165/g each vs the filter's
        # ~330/V): ~2000 needles plan to ~12 words and still screen 5-10x
        # faster than the fused sticky grid; bigger sets plan to None.
        e0 = self.engines[0]
        self.R, self.t_tile, self.interpret = e0.R, e0.t_tile, e0.interpret
        from .filter_scan import attach_filter

        if attach_filter(self, machine, max_words=12):
            # The top-level screen covers every needle; per-group screens
            # in the non-fused fallback would just re-fire on the same
            # corpus.  When the top-level plan fails (very large sets),
            # the groups keep their own screens.
            for e in self.engines:
                e._filter_lay = None

    def _stage(self, text: utf8.TextLike):
        data = utf8.to_u8(text)
        if len(data) == 0:
            return None
        return self.engines[0].stage(data)

    def adopt_staged(self, st):
        """Cross-searcher staging adoption (see PallasAcEngine.adopt_staged):
        every group pass scans the shared staging, so the overlap must cover
        the FULL machine's synchronization window, not just group 0's."""
        if st is None or st.plan.overlap < max(0, self.machine.max_needle_bytes - 1):
            return None
        e0 = self.engines[0]
        if st.plan.n_streams != e0.S or st.plan.time_len % e0.t_tile:
            return None
        return st

    @property
    def n_groups(self) -> int:
        return len(self.engines)

    @property
    def total_rows(self) -> int:
        """Summed physical table rows across group passes — the effective
        device rate is ~KERNEL_ROW_RATE / total_rows."""

        def rows(e):
            if hasattr(e, "c16"):
                return e.c16.rows_total
            return e.comb.rows_total if hasattr(e, "comb") else e.comp.rows

        return sum(rows(e) for e in self.engines)

    # -- fused single-launch count ------------------------------------------
    #
    # G per-group passes pay G kernel launches (a ~30 ms relay round-trip
    # each on tunneled devices) plus G stream re-reads.  When every group
    # fits ONE uniform comb16 field split (ops.comb16_scan.
    # build_comb16_uniform), a single grid of G * n_tiles segments scans the
    # resident streams against each group's tables in one launch: per-group
    # scalars ride in SMEM, table BlockSpecs step to segment (i // n_tiles)'s
    # slice, counts accumulate across segments.  Gathers/byte are unchanged
    # (the ~165/rows law) — this removes the per-pass launch + dispatch
    # overhead, which dominates small-corpus scans.

    def _fused_setup(self):
        if self._fused is False:
            import os

            from .comb16_scan import build_comb16_uniform

            self._fused = None
            if (
                len(self.engines) >= 2
                and os.environ.get("AMT_FUSED_GROUPS", "1") != "0"
            ):
                try:
                    # Fused-specific partition: groups sized against the
                    # FORCED uniform split (the extraction partition in
                    # self.engines packs to per-group capacity, which a
                    # uniform split cannot hold — counts don't depend on
                    # group boundaries, so the partitions may differ).
                    groups, subs_raw, subs, split = partition_uniform16(
                        self.machine, self.max_rows
                    )
                    if len(subs) < 2:
                        # Whole machine fits one comb16 pass: nothing to
                        # fuse (and the dispatcher would not group it).
                        raise CapacityError("single uniform group")
                    _, stacked = build_comb16_uniform(
                        subs, self.max_rows, split=split
                    )
                    cst = stacked["consts"]
                    fused_rows = len(subs) * (cst["rows_c"] + cst["rows_a"] + 2)
                    # Economics: each avoided launch is ~30 ms on tunneled
                    # devices while an extra row costs corpus_bytes/165 GB/s
                    # per scan, so one-shot scans tolerate sizable row
                    # inflation; cap it so staged/sustained reuse (where
                    # launches amortize) is not badly regressed.
                    if fused_rows <= max(
                        1.3 * self.total_rows,
                        self.total_rows + 2 * len(self.engines),
                    ):
                        self._fused = dict(
                            stacked=stacked,
                            machines=subs,
                            raw_machines=subs_raw,
                            G=len(subs),
                            dev=dict(
                                classmap=jnp.asarray(stacked["classmap"]),
                                comb=jnp.asarray(stacked["comb"]),
                                aux=jnp.asarray(stacked["aux"]),
                                rootseg=jnp.asarray(stacked["rootseg"]),
                                gscal=jnp.asarray(stacked["gscal"]),
                            ),
                            fns={},
                        )
                except CapacityError:
                    self._fused = None
        return self._fused

    def _fused_bscal(self, st):
        from .pallas_scan import _boundary_scalars, _zero_inert

        if not st.zero_inert or all(
            _zero_inert(m) for m in self._fused["machines"]
        ):
            return st.bscal
        if st._bscal_strict is None:
            vend = np.asarray(st.vend_t).reshape(-1)
            st._bscal_strict = jnp.asarray(_boundary_scalars(st.warm_np, vend, False))
        return st._bscal_strict

    def _get_fused_count_fn(self, T: int, reps: int):
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from .comb16_scan import _make_c16_count_kernel_dyn

        f = self._fused
        key = (T, reps)
        if key not in f["fns"]:
            e0 = self.engines[0]
            R, t_tile = e0.R, e0.t_tile
            n_tiles = T // t_tile
            G = f["G"]
            cst = f["stacked"]["consts"]
            rows_c, rows_a = cst["rows_c"], cst["rows_a"]
            from .pallas_scan import _fit_unroll

            rt = rows_c + rows_a + 2
            unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), t_tile)
            C = dict(cst, interpret=e0.interpret)
            kernel = _make_c16_count_kernel_dyn(
                t_tile, R, C, n_tiles, unroll, cst["n_ranges"], n_groups=G, reps=reps
            )
            n_grid = reps * G * n_tiles

            @jax.jit
            def run(bscal, gscal, classmap, comb, aux, rootseg, warm, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                gsel = lambda i: ((i // n_tiles) % G, 0, 0)  # noqa: E731
                return pl.pallas_call(
                    kernel,
                    grid=(n_grid,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((1, 2, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, rows_c, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, rows_a, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 2, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=e0.interpret,
                )(bscal, gscal, classmap, comb, aux, rootseg, warm, vend, streams)

            f["fns"][key] = run
        return f["fns"][key]

    def count_staged(self, st, reps: int = 1) -> int:
        f = self._fused_setup()
        if f is not None:
            try:
                fn = self._get_fused_count_fn(st.plan.time_len, reps)
                d = f["dev"]
                counts = fn(
                    self._fused_bscal(st), d["gscal"], d["classmap"], d["comb"],
                    d["aux"], d["rootseg"], st.warm_t, st.vend_t, st.streams_dev,
                )
                counts = np.asarray(counts, dtype=np.int64)
                if st.live_np is not None:
                    counts = counts[st.live_np]
                return int(counts.sum())
            except (RuntimeError, NotImplementedError, ValueError) as e:  # pragma: no cover
                # A Mosaic/backend rejection of the fused kernel must
                # degrade to the per-group passes, not fail the scan.
                # (Narrow except: programming errors still propagate.)
                import warnings

                warnings.warn(f"fused grouped count unavailable ({e}); "
                              "falling back to per-group passes")
                self._fused = None
                self._fused_sticky = None  # _fused_bscal needs _fused
        return sum(e.count_staged(st, reps) for e in self.engines)

    def count(self, text: utf8.TextLike) -> int:
        st = self._stage(text)
        if st is None:
            return 0
        return self.count_staged(st)

    def _fused_sticky_setup(self):
        """Uniform comb16 sticky table set for the fused single-launch
        containsAny, or None (fall back to per-group passes).  Only
        attempted when the count fusion engaged (same group economics)."""
        if getattr(self, "_fused_sticky", False) is False:
            self._fused_sticky = None
            if self._fused_setup() is not None:
                from .comb16_scan import build_sticky16_uniform

                try:
                    # The sticky view's comb structure differs from the
                    # count view's, so the fused containsAny partitions the
                    # needle set against its OWN view (a count-validated
                    # partition can overflow the sticky build).
                    _, _, svs, split = partition_uniform16(
                        self.machine, self.max_rows, view="sticky"
                    )
                    if len(svs) < 2:
                        raise CapacityError("single uniform sticky group")
                    c16s, stacked = build_sticky16_uniform(
                        [], self.max_rows, split=split, views=svs
                    )
                except CapacityError:
                    return None
                # Economics guard (mirrors the count fusion's): uniform
                # (max) rows per group must not outweigh the launch
                # savings vs per-group sticky passes.
                cst = stacked["consts"]
                fused_rows = len(c16s) * (cst["rows_c"] + cst["rows_a"] + 2)
                per_group = sum(c.rows_c + c.rows_a + 2 for c in c16s)
                if fused_rows > 1.3 * per_group:
                    return None
                self._fused_sticky = dict(
                    stacked=stacked,
                    G=len(c16s),
                    dev=dict(
                        classmap=jnp.asarray(stacked["classmap"]),
                        comb=jnp.asarray(stacked["comb"]),
                        aux=jnp.asarray(stacked["aux"]),
                        rootseg=jnp.asarray(stacked["rootseg"]),
                        gscal=jnp.asarray(stacked["gscal"]),
                    ),
                    fns={},
                )
        return self._fused_sticky

    def _get_fused_contains_fn(self, T: int):
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from .comb16_scan import _make_c16_contains_kernel_dyn
        from .pallas_scan import _fit_unroll

        f = self._fused_sticky
        if T not in f["fns"]:
            e0 = self.engines[0]
            R, t_tile = e0.R, e0.t_tile
            n_tiles = T // t_tile
            G = f["G"]
            cst = f["stacked"]["consts"]
            rows_c, rows_a = cst["rows_c"], cst["rows_a"]
            rt = rows_c + rows_a + 2
            unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), t_tile)
            C = dict(cst, interpret=e0.interpret)
            kernel = _make_c16_contains_kernel_dyn(
                t_tile, R, C, n_tiles, unroll, n_groups=G
            )

            @jax.jit
            def run(bscal, gscal, classmap, comb, aux, rootseg, vend, streams_u8):
                streams = streams_u8.reshape(T, R, 128)
                gsel = lambda i: ((i // n_tiles) % G, 0, 0)  # noqa: E731
                return pl.pallas_call(
                    kernel,
                    grid=(G * n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((1, 2, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, rows_c, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, rows_a, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 2, 128), gsel, memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R, 128), lambda i: (i % n_tiles, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((R, 128), jnp.int32),
                        pltpu.VMEM((R, 128), jnp.int32),
                    ],
                    interpret=e0.interpret,
                )(bscal, gscal, classmap, comb, aux, rootseg, vend, streams)

            f["fns"][T] = run
        return f["fns"][T]

    def contains_staged(self, st) -> bool:
        """containsAny.  With a uniform fused table set: ONE launch answers
        all G groups (per-segment absorb folds into a sticky hit mask).
        Otherwise: per-group passes with a host-driven early exit — the
        analogue of the reference's ``Done True`` fold early exit
        (``AhoCorasick/Searcher.hs:156-164``) at group granularity."""
        from .filter_scan import filter_contains

        got = filter_contains(self, st)
        if got is not None:
            return got  # exact short-needle hit / no fire anywhere
        fs = self._fused_sticky_setup()
        if fs is not None:
            try:
                fn = self._get_fused_contains_fn(st.plan.time_len)
                d = fs["dev"]
                out = fn(
                    self._fused_bscal(st), d["gscal"], d["classmap"], d["comb"],
                    d["aux"], d["rootseg"], st.vend_t, st.streams_dev,
                )
                out = np.asarray(out)
                if st.live_np is not None:
                    out = out[st.live_np]
                return bool(out.any())
            except (RuntimeError, NotImplementedError, ValueError) as e:  # pragma: no cover
                import warnings

                warnings.warn(f"fused grouped contains unavailable ({e}); "
                              "falling back to per-group passes")
                self._fused_sticky = None
        return any(e.contains_staged(st) for e in self.engines)

    def contains(self, text: utf8.TextLike) -> bool:
        st = self._stage(text)
        return st is not None and self.contains_staged(st)

    def matches_arrays(self, text: utf8.TextLike) -> Tuple[np.ndarray, np.ndarray]:
        """(ends, value_ids) in reference emission order across all groups."""
        return self.matches_arrays_staged(self._stage(text))

    def matches_arrays_staged(self, st) -> Tuple[np.ndarray, np.ndarray]:
        from .pallas_scan import _expand_outputs

        all_ends: List[np.ndarray] = []
        all_vids: List[np.ndarray] = []
        for eng, vid_map in zip(self.engines, self.vid_maps):
            if st is None:
                continue
            pos, states = eng.match_positions_staged(st)
            ends, sub_vids = _expand_outputs(eng.machine, pos, states)
            all_ends.append(ends)
            all_vids.append(vid_map[sub_vids])
        ends = np.concatenate(all_ends) if all_ends else np.zeros(0, np.int64)
        vids = np.concatenate(all_vids) if all_vids else np.zeros(0, np.int64)
        if len(ends) == 0:
            return ends.astype(np.int64), vids.astype(np.int32)
        lens = np.fromiter(
            (len(self.machine.needles[int(v)]) for v in vids), np.int64, len(vids)
        )
        order = np.lexsort((-lens, ends))  # end asc, longer needle first
        return ends[order].astype(np.int64), vids[order].astype(np.int32)

    def value_presence(self, text: utf8.TextLike, n_values: int) -> np.ndarray:
        present = np.zeros(n_values, dtype=bool)
        st = self._stage(text)
        if st is None:
            return present
        for eng, vid_map in zip(self.engines, self.vid_maps):
            _, states = eng.match_positions_staged(st)
            sub = ac.presence_of_states(eng.machine, states, len(eng.machine.values))
            present[vid_map[np.flatnonzero(sub)]] = True
        return present


__all__ = [
    "GroupedPallasAcEngine",
    "partition_adaptive",
    "partition_needles",
    "partition_uniform16",
]
