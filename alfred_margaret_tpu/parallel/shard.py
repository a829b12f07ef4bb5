"""Multi-chip matching over a ``jax.sharding.Mesh``.

The reference is strictly single-threaded (SURVEY.md §2.4); this module is
the TPU-native replacement for the parallelism it lacks. Three mesh axes:

* ``data``  — corpus shards (independent documents / stream groups);
* ``seq``   — chunks of one long document.  Sequence parallelism for a DFA
  scan *is* chunk-overlap decomposition: the state at any position depends
  on at most ``max_needle_bytes`` of history, so chunks re-derive exact
  state from a warm-up overlap (``ops.xla_scan``);
* ``needle`` — needle-set shards for automata beyond one chip's VMEM table
  budget: needles are partitioned into per-device-group sub-automata
  (stacked, padded tables sharded over this axis) and every group scans the
  (replicated-over-needle) streams.

Counts reduce with ``jax.lax.psum`` over all three axes (ICI); the result
is bit-identical to the single-chip scan for any mesh shape — every input
position is emitted by exactly one stream, and needle groups are disjoint.

The per-shard body is the Pallas count kernel on TPU backends and the
``lax.scan`` gather loop elsewhere (virtual CPU meshes, tests).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ac
from ..models.ac import AcMachine
from ..utils import utf8
from .xla_scan_local import local_scan_counts, local_scan_states

from ..ops.xla_scan import StreamPlan, build_streams, plan_streams


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (``jax.distributed.initialize``) so a mesh
    can span hosts — collectives ride ICI within a slice and DCN across
    slices; corpus shards are per-host (each process feeds its own ``data``
    rows), while ``psum`` counts are global (SURVEY.md §5.8: the TPU-native
    stand-in for the comm backend the reference lacks).

    No-op when already initialized or on a single process (the common
    single-host case, where the in-process mesh covers all local chips).
    Returns the number of processes.

    CPU smoke-testing note: cross-process collectives on the CPU backend
    ride gloo (``jax_cpu_collectives_implementation``, default ``gloo``);
    ``experiments/multiproc_smoke.py`` exercises this whole path — two
    processes, localhost coordinator, one global mesh, psum count parity.
    """
    if coordinator_address is not None:
        # Explicit coordinator: a failure here means the job is NOT
        # connected — propagate instead of silently running per-host.
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    else:
        try:
            jax.distributed.initialize()  # env-driven (TPU pod metadata)
        except (RuntimeError, ValueError):
            pass  # already initialized, or single-process without coordinator
    return jax.process_count()


def make_mesh(
    devices=None, data: Optional[int] = None, seq: int = 1, needle: int = 1
) -> Mesh:
    """A (data, seq, needle) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (seq * needle)
    assert data * seq * needle == n, f"mesh {data}x{seq}x{needle} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, seq, needle)
    return Mesh(dev_array, ("data", "seq", "needle"))


def _balanced_groups(machine: AcMachine, n_groups: int) -> List[List[int]]:
    """Split value ids into exactly ``n_groups`` groups, duplicates together,
    balanced by total needle bytes."""
    sizes = [0] * n_groups
    groups: List[List[int]] = [[] for _ in range(n_groups)]
    first_group: dict = {}
    for vid, needle in enumerate(machine.needles):
        g = first_group.get(needle)
        if g is None:
            g = int(np.argmin(sizes))
            first_group[needle] = g
            sizes[g] += len(needle) + 1
        groups[g].append(vid)
    return groups


class DistributedAcEngine:
    """Mesh-parallel AC match counting.

    Streams are laid out exactly as in the single-device engines, the stream
    axis is sharded over (data, seq), needle groups over (needle), and the
    jitted step psums per-shard counts so every device returns the global
    count.  ``inner`` selects the per-shard kernel: "pallas" (TPU), "xla"
    (anywhere), or "auto".
    """

    def __init__(self, machine: AcMachine, mesh: Mesh, inner: str = "auto", sub_build=None,
                 interpret: bool = False):
        """``sub_build`` rebuilds a sub-automaton from (needle, value) pairs
        when the needle axis partitions the machine; defaults to ``ac.build``.
        Pass ``case_dfa.compose_build`` for composed IgnoreCase machines so
        needle groups keep the case-folding composition (a plain rebuild
        would silently produce case-sensitive scanners)."""
        self.machine = machine
        self.mesh = mesh
        self._interpret = interpret
        self._sub_build = sub_build if sub_build is not None else ac.build
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.n_stream_shards = axis_sizes.get("data", 1) * axis_sizes.get("seq", 1)
        self.n_needle_groups = axis_sizes.get("needle", 1)
        self._stream_axes = tuple(
            a for a in ("data", "seq") if a in mesh.axis_names
        )
        self._all_axes = tuple(
            a for a in ("data", "seq", "needle") if a in mesh.axis_names
        )
        if inner == "auto":
            inner = "pallas" if (interpret or jax.default_backend() in ("tpu", "axon")) else "xla"
        self.inner = inner
        self.overlap = max(0, machine.max_needle_bytes - 1)

        # Needle groups (G == 1 means the full machine).
        if self.n_needle_groups > 1:
            if any(len(n) == 0 for n in machine.needles):
                # Same non-decomposability as ops.grouped: the empty
                # needle's root-piggyback count depends on the UNION of all
                # shards' non-root states; per-shard psums undercount.
                # Data/seq-only meshes are fine (every shard scans the full
                # machine).
                raise ValueError(
                    "empty needle cannot be needle-sharded; use a "
                    "data/seq-only mesh for empty-needle machines"
                )
            self.vid_groups = _balanced_groups(machine, self.n_needle_groups)
            self.sub_machines = [
                self._sub_build([(machine.needles[v], machine.values[v]) for v in vids])
                for vids in self.vid_groups
            ]
        else:
            self.vid_groups = [list(range(len(machine.needles)))]
            self.sub_machines = [machine]

        # Bitap inner: small needle sets on data/seq meshes take the
        # register-automaton kernel per shard (ops.bitap_scan; measured
        # ~3x the dense kernel's dependent-gather floor on v5e).  Needle
        # sharding would need per-group track layouts baked into one
        # program — the sets that fit 30 bits never need a needle axis.
        self._bitap_lay = None
        if self.inner == "pallas" and self.n_needle_groups == 1:
            from ..ops.comb_scan import plan_bitap_auto

            # Same gcost-derived word budget as the single-chip dispatcher
            # (a V=3+trap CI layout can lose to the dense/comb ladder; the
            # crossover law is identical per shard).  Composed-IgnoreCase
            # trap-bearing layouts psum a sticky trap plane alongside the
            # result and count_staged / contains_any rerun the dense
            # per-shard step when a length-changing unlowering occurs.
            self._bitap_lay = plan_bitap_auto(machine)
            if self._bitap_lay is not None:
                wl_all = self._bitap_lay.all_words()
                bt = np.stack([wl.btab for wl in wl_all])
                self._btab_dev = jnp.asarray(
                    bt.reshape(2 * len(wl_all), 128).astype(np.int32)
                )

        if self.inner == "pallas":
            from ..ops.pallas_scan import CapacityError, CompressedMachine

            try:
                comps = [
                    CompressedMachine.from_machine(sm, force_packing=1)
                    for sm in self.sub_machines
                ]
            except CapacityError as e:
                raise CapacityError(
                    f"{e}; shard the automaton over more 'needle' mesh devices "
                    "(each group must fit one chip's kernel table) or use "
                    "inner='xla'"
                ) from e
            rows_max = max(c.rows for c in comps)
            cms = np.stack(
                [np.resize(c.classmap, 256).reshape(2, 128) for c in comps]
            )  # [G, 2, 128]
            tabs = np.zeros((len(comps), rows_max, 128), dtype=np.int32)
            for g, c in enumerate(comps):
                tabs[g, : c.rows] = c.packed.reshape(c.rows, 128)
            self._cms = jnp.asarray(cms.astype(np.int32))
            self._tabs = jnp.asarray(tabs)
            self._rows = rows_max
            # Steady-loop op-shaving flags, valid only if every needle
            # group's table qualifies (one kernel serves all groups).
            self._fold = all(
                bool((np.resize(c.classmap, 256)[127:] == c.classmap[127]).all())
                for c in comps
            )
            self._max_entries = max(c.n_states * c.k for c in comps)
            self._in_range = self._max_entries <= 128
            self._max_count = max(
                int(sm.match_count.max(initial=0)) for sm in self.sub_machines
            )
            # Gather-free byte->class chain: bakes classmap constants into
            # the kernel, so only valid when one group serves all shards.
            from ..ops.pallas_scan import _classmap_wpairs

            self._wpairs = (
                _classmap_wpairs(np.resize(comps[0].classmap, 256))
                if len(comps) == 1
                else None
            )
            # Mid-tier groups: a UNIFORM comb16 table set (one kernel,
            # per-group SMEM scalars) replaces the dense count step when it
            # needs fewer gathers/byte — the same comb16-vs-dense economics
            # as the single-chip engine ladder, now per needle shard.
            self._c16g = None
            import os as _os

            if rows_max > 8 and _os.environ.get("AMT_DIST_COMB16", "1") != "0":
                from ..models.minimize import count_minimized
                from ..ops.comb16_scan import build_comb16_uniform

                try:
                    _, c16g = build_comb16_uniform(
                        [count_minimized(sm) for sm in self.sub_machines]
                    )
                    cst = c16g["consts"]
                    if cst["rows_c"] + cst["rows_a"] + 2 < rows_max:
                        self._c16g = c16g
                        self._c16g_dev = dict(
                            classmap=jnp.asarray(c16g["classmap"]),
                            comb=jnp.asarray(c16g["comb"]),
                            aux=jnp.asarray(c16g["aux"]),
                            rootseg=jnp.asarray(c16g["rootseg"]),
                            gscal=jnp.asarray(c16g["gscal"]),
                        )
                except CapacityError:
                    self._c16g = None
        else:
            n_states_max = max(sm.n_states for sm in self.sub_machines)
            deltas = np.zeros(
                (len(self.sub_machines), n_states_max * 256), dtype=np.int32
            )
            mcs = np.zeros((len(self.sub_machines), n_states_max), dtype=np.int32)
            for g, sm in enumerate(self.sub_machines):
                deltas[g, : sm.n_states * 256] = sm.delta.reshape(-1)
                mcs[g, : sm.n_states] = sm.match_count
            self._deltas = jnp.asarray(deltas)
            self._mcs = jnp.asarray(mcs)
        self._count_step = None

    # -- jitted step -------------------------------------------------------

    def _build_count_step(self, T: int, S: int, use_bitap: bool = True):
        mesh = self.mesh
        stream_axes = self._stream_axes
        all_axes = self._all_axes
        S_local = S // self.n_stream_shards

        if self.inner == "pallas" and use_bitap and self._bitap_lay is not None:
            return self._build_bitap_count_step(T, S)
        if self.inner == "pallas" and self._c16g is not None:
            return self._build_c16_count_step(T, S)
        if self.inner == "pallas":
            from ..ops import pallas_scan as ps

            R_local = S_local // 128
            t_tile = 128 if T % 128 == 0 else T
            n_tiles = T // t_tile
            unroll = 8 if self._rows <= 8 else (4 if self._rows <= 16 else 2)
            while t_tile % unroll:
                unroll //= 2
            kernel = ps._make_count_kernel(
                t_tile,
                R_local,
                self._rows,
                n_tiles,
                unroll,
                reps=1,
                fold=self._fold,
                in_range=self._in_range,
                defer=(
                    (self._max_entries - 1) * unroll < (1 << ps._STATE_BITS)
                    and self._max_count * unroll < (1 << (31 - ps._STATE_BITS))
                ),
                # On hardware the mod-128 lane indexing makes the raw-entry
                # state carry safe whenever the table is single-row; the
                # interpret flag makes the kernel emulate that wrap in
                # interpreter-mode tests (clamping would corrupt the carry).
                nomask=self._in_range,
                interpret=self._interpret,
                wpairs=self._wpairs,
            )

            interp = self._interpret

            def local_counts(cm, tab, streams, warm, vend):
                # cm [1,2,128], tab [1,rows,128] (this group's shard);
                # streams [T, S_local]; warm/vend [S_local]
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                # Exclude fully-padded streams (vend == 0) from the
                # interior-tile boundary minimum; their unmasked pad scans
                # are nulled below.
                big = jnp.int32(2**31 - 1)
                nzmin = jnp.min(jnp.where(vend > 0, vend, big))
                bmin = jnp.where(jnp.any(vend > 0), nzmin, 0)
                bscal = jnp.stack([warm.max(), bmin]).astype(jnp.int32)
                counts = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (self._rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                        ),
                        pl.BlockSpec(
                            (t_tile, R_local, 128),
                            lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                    out_shape=jax.ShapeDtypeStruct((R_local, 128), jnp.int32),
                    scratch_shapes=[
                        pltpu.VMEM((R_local, 128), jnp.int32),
                        pltpu.VMEM((R_local, 128), jnp.int32),
                    ],
                    interpret=interp,
                )(
                    bscal,
                    cm[0],
                    tab[0],
                    warm.reshape(R_local, 128),
                    vend.reshape(R_local, 128),
                    streams.reshape(T, R_local, 128),
                )
                # Null fully-padded streams: interior tiles scan their
                # zero windows unmasked (cf. ops.pallas_scan).
                live = vend.reshape(R_local, 128) > 0
                return jnp.where(live, counts, 0)

            def per_shard(cm, tab, streams, warm, vend):
                # psum the per-stream int32 counts elementwise and leave the
                # final reduction to the host (int64 there): a device-side
                # int32 .sum() overflows past 2^31 shard matches, and
                # without jax_enable_x64 an astype(int64) silently
                # truncates back to int32.  Elementwise sums stay tiny
                # (one stream's matches x n_shards).
                local = local_counts(cm, tab, streams, warm, vend)
                return jax.lax.psum(local, all_axes)

            table_args = (self._cms, self._tabs)
            table_specs = (P("needle"), P("needle"))
        else:

            def per_shard(delta, mc, streams, warm, vend):
                # Per-stream int32 counts, reduced elementwise; host sums in
                # int64 (see the pallas branch above for the overflow note).
                counts = local_scan_counts(delta[0], mc[0], streams, warm, vend)
                return jax.lax.psum(counts, all_axes)

            table_args = (self._deltas, self._mcs)
            table_specs = (P("needle"), P("needle"))

        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=table_specs
            + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(),
            # pallas_call's out_shape carries no varying-axes metadata.
            check_vma=False,
        )
        return jax.jit(shard_fn), table_args

    def _build_bitap_count_step(self, T: int, S: int):
        """Per-shard bitap count step (small needle sets, data/seq meshes):
        same shard/psum protocol as the dense step, but the inner kernel is
        the register automaton (ops.bitap_scan)."""
        import dataclasses

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops import bitap_scan as bs
        from ..ops import pallas_scan as ps

        mesh, stream_axes, all_axes = self.mesh, self._stream_axes, self._all_axes
        S_local = S // self.n_stream_shards
        R_local = S_local // 128
        t_tile = 128 if T % 128 == 0 else T
        n_tiles = T // t_tile
        lay = dataclasses.replace(
            self._bitap_lay, unroll=ps._fit_unroll(self._bitap_lay.unroll, t_tile)
        )
        VT = len(lay.all_words())
        has_trap = lay.has_trap
        kernel = bs._make_bitap_count_kernel(t_tile, R_local, n_tiles, 1, lay)
        interp = self._interpret
        rc_spec = pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        rc_shape = jax.ShapeDtypeStruct((R_local, 128), jnp.int32)

        def per_shard(btab, streams, warm, vend):
            # Warm mask only: bitap eligibility guarantees pad bytes zero
            # the register, so no valid-end freeze is needed (the second
            # boundary scalar is the interior-tile no-freeze sentinel).
            bscal = jnp.stack([warm.max(), jnp.int32(1 << 30)]).astype(jnp.int32)
            out = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((2 * VT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    rc_spec,
                    pl.BlockSpec(
                        (t_tile, R_local, 128),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[rc_spec, rc_spec] if has_trap else rc_spec,
                out_shape=[rc_shape, rc_shape] if has_trap else rc_shape,
                scratch_shapes=[
                    pltpu.VMEM((VT, R_local, 128), jnp.int32),
                    pltpu.VMEM((R_local, 128), jnp.int32),
                ]
                + ([pltpu.VMEM((R_local, 128), jnp.int32)] if has_trap else []),
                interpret=interp,
            )(
                bscal,
                btab,
                warm.reshape(R_local, 128),
                streams.reshape(T, R_local, 128),
            )
            live = vend.reshape(R_local, 128) > 0
            if has_trap:
                counts, trap = out
                # PER-STREAM planes, NOT psum'd: the trap plane localizes
                # which streams a length-changing unlowering touched, so
                # recovery re-scans only those streams on the host instead
                # of paying a full dense re-scan of every shard.  The host
                # sums counts anyway, so no collective is needed at all.
                return jnp.stack(
                    [jnp.where(live, counts, 0), jnp.where(live, trap, 0)]
                )
            return jax.lax.psum(jnp.where(live, out, 0), all_axes)

        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(),) + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(None, stream_axes) if has_trap else P(),
            check_vma=False,
        )
        return jax.jit(shard_fn), (self._btab_dev,)

    def _build_bitap_contains_step(self, T: int, S: int):
        """Per-shard bitap sticky existence step (see the count step)."""
        import dataclasses

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops import bitap_scan as bs
        from ..ops import pallas_scan as ps

        mesh, stream_axes, all_axes = self.mesh, self._stream_axes, self._all_axes
        S_local = S // self.n_stream_shards
        R_local = S_local // 128
        t_tile = 128 if T % 128 == 0 else T
        n_tiles = T // t_tile
        lay = dataclasses.replace(
            self._bitap_lay, unroll=ps._fit_unroll(self._bitap_lay.unroll, t_tile)
        )
        VT = len(lay.all_words())
        has_trap = lay.has_trap
        kernel = bs._make_bitap_contains_kernel(t_tile, R_local, n_tiles, 1, lay)
        interp = self._interpret
        rc_spec = pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        rc_shape = jax.ShapeDtypeStruct((R_local, 128), jnp.int32)

        def per_shard(btab, streams, warm, vend):
            out = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((2 * VT, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (t_tile, R_local, 128),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[rc_spec, rc_spec] if has_trap else rc_spec,
                out_shape=[rc_shape, rc_shape] if has_trap else rc_shape,
                scratch_shapes=[
                    pltpu.VMEM((VT, R_local, 128), jnp.int32),
                    pltpu.VMEM((R_local, 128), jnp.int32),
                ]
                + ([pltpu.VMEM((R_local, 128), jnp.int32)] if has_trap else []),
                interpret=interp,
            )(btab, streams.reshape(T, R_local, 128))
            live = vend.reshape(R_local, 128) > 0
            if has_trap:
                hits, trap = out
                # PER-STREAM planes (see the count step): the trap plane
                # localizes recovery to the trapped streams only.
                return jnp.stack(
                    [jnp.where(live, hits, 0), jnp.where(live, trap, 0)]
                )
            hit = jnp.where(live, out != 0, False)
            return jax.lax.psum(hit.sum().astype(jnp.int32), all_axes)

        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(),) + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(None, stream_axes) if has_trap else P(),
            check_vma=False,
        )
        return jax.jit(shard_fn), (self._btab_dev,)

    def _sticky16_tables(self):
        """Cached uniform comb16 sticky table set (shape-independent — one
        host-side build + device upload shared by every (T, S) step), or
        None when no single field split fits every group's sticky view."""
        if not hasattr(self, "_sticky16"):
            from ..ops.comb16_scan import build_sticky16_uniform
            from ..ops.pallas_scan import CapacityError

            self._sticky16 = None
            try:
                # Shared builder with the fused grouped containsAny: gscal
                # rows are per-group (root base, absorb base).
                _, stacked = build_sticky16_uniform(self.sub_machines)
            except CapacityError:
                return None
            self._sticky16 = dict(
                stacked=stacked,
                args=(
                    jnp.asarray(stacked["classmap"]),
                    jnp.asarray(stacked["comb"]),
                    jnp.asarray(stacked["aux"]),
                    jnp.asarray(stacked["rootseg"]),
                    jnp.asarray(stacked["gscal"]),
                ),
            )
        return self._sticky16

    def _try_build_c16_contains_step(self, T: int, S: int, dense_rows: int):
        """Uniform comb16 sticky step for mid-tier needle groups, or None
        when it does not fit or does not beat the ``dense_rows``-gather
        dense sticky step (caller falls back)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops.comb16_scan import _make_c16_contains_kernel_dyn

        sticky = self._sticky16_tables()
        if sticky is None:
            return None
        stacked = sticky["stacked"]
        cst16 = stacked["consts"]
        if cst16["rows_c"] + cst16["rows_a"] + 2 >= dense_rows:
            return None  # the dense sticky chain is already cheaper

        mesh, stream_axes, all_axes = self.mesh, self._stream_axes, self._all_axes
        S_local = S // self.n_stream_shards
        R_local = S_local // 128
        t_tile = 128 if T % 128 == 0 else T
        n_tiles = T // t_tile
        from ..ops.pallas_scan import _fit_unroll

        cst = stacked["consts"]
        rows_c, rows_a = cst["rows_c"], cst["rows_a"]
        rt = rows_c + rows_a + 2
        unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), t_tile)
        C = dict(cst, interpret=self._interpret)
        kernel = _make_c16_contains_kernel_dyn(t_tile, R_local, C, n_tiles, unroll)
        # n_groups == 1 per shard: the kernel writes the final carried base;
        # the absorb comparison happens below, outside the pallas_call.
        interp = self._interpret
        n_gscal = stacked["gscal"].shape[1]

        def per_shard(cm, comb, aux, rootseg, gscal, streams, warm, vend):
            big = jnp.int32(2**31 - 1)
            nzmin = jnp.min(jnp.where(vend > 0, vend, big))
            bmin = jnp.where(jnp.any(vend > 0), nzmin, 0)
            bscal = jnp.stack([warm.max(), bmin]).astype(jnp.int32)
            out = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (t_tile, R_local, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((R_local, 128), jnp.int32),
                scratch_shapes=[pltpu.VMEM((R_local, 128), jnp.int32)],
                interpret=interp,
            )(
                bscal,
                gscal.reshape(1, n_gscal),
                cm[0],
                comb[0],
                aux[0],
                rootseg[0],
                vend.reshape(R_local, 128),
                streams.reshape(T, R_local, 128),
            )
            live = vend.reshape(R_local, 128) > 0
            hit = jnp.where(live, out == gscal[0, 1], False)  # absorb base
            return jax.lax.psum(hit.sum().astype(jnp.int32), all_axes)

        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("needle"),) * 5
            + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn), sticky["args"]

    def _build_c16_count_step(self, T: int, S: int):
        """Per-shard comb16 count kernel (uniform field split across needle
        groups, per-group scalars in SMEM — ``ops.comb16_scan.
        _make_c16_count_kernel_dyn``), psum-reduced like the dense step."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops.comb16_scan import _make_c16_count_kernel_dyn

        mesh = self.mesh
        stream_axes = self._stream_axes
        all_axes = self._all_axes
        S_local = S // self.n_stream_shards
        R_local = S_local // 128
        t_tile = 128 if T % 128 == 0 else T
        n_tiles = T // t_tile
        from ..ops.pallas_scan import _fit_unroll

        cst = self._c16g["consts"]
        rows_c, rows_a = cst["rows_c"], cst["rows_a"]
        rt = rows_c + rows_a + 2
        unroll = _fit_unroll(8 if rt <= 8 else (4 if rt <= 16 else 2), t_tile)
        C = dict(cst, interpret=self._interpret)
        kernel = _make_c16_count_kernel_dyn(
            t_tile, R_local, C, n_tiles, unroll, cst["n_ranges"]
        )
        interp = self._interpret
        n_gscal = self._c16g["gscal"].shape[1]

        def local_counts(cm, comb, aux, rootseg, gscal, streams, warm, vend):
            big = jnp.int32(2**31 - 1)
            nzmin = jnp.min(jnp.where(vend > 0, vend, big))
            bmin = jnp.where(jnp.any(vend > 0), nzmin, 0)
            bscal = jnp.stack([warm.max(), bmin]).astype(jnp.int32)
            counts = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_a, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (t_tile, R_local, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((R_local, 128), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((R_local, 128), jnp.int32),
                    pltpu.VMEM((R_local, 128), jnp.int32),
                ],
                interpret=interp,
            )(
                bscal,
                gscal.reshape(1, n_gscal),
                cm[0],
                comb[0],
                aux[0],
                rootseg[0],
                warm.reshape(R_local, 128),
                vend.reshape(R_local, 128),
                streams.reshape(T, R_local, 128),
            )
            live = vend.reshape(R_local, 128) > 0
            return jnp.where(live, counts, 0)

        def per_shard(cm, comb, aux, rootseg, gscal, streams, warm, vend):
            # Elementwise int32 psum + host int64 reduction (overflow note
            # in _build_count_step's dense branch).
            local = local_counts(cm, comb, aux, rootseg, gscal, streams, warm, vend)
            return jax.lax.psum(local, all_axes)

        d = self._c16g_dev
        table_args = (d["classmap"], d["comb"], d["aux"], d["rootseg"], d["gscal"])
        table_specs = (P("needle"),) * 5

        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=table_specs
            + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(shard_fn), table_args

    # -- layout ------------------------------------------------------------

    def _layout(self, data: np.ndarray):
        """Streams padded so each (data, seq) shard gets whole lane groups."""
        quantum = self.n_stream_shards * (128 if self.inner == "pallas" else 8)
        plan = plan_streams(
            len(data),
            self.overlap,
            n_streams=None,
            max_streams=max(32768 if self.inner == "pallas" else 1024, quantum),
        )
        s = max(quantum, -(-plan.n_streams // quantum) * quantum)
        emit = -(-len(data) // s) if len(data) else 1
        t = emit + self.overlap
        if self.inner == "pallas":
            t = -(-t // 128) * 128  # time padded to the kernel tile
        plan = StreamPlan(
            n=len(data), n_streams=s, emit_len=emit, overlap=self.overlap, time_len=t
        )
        return plan, build_streams(data, plan)

    def stage(self, text: utf8.TextLike) -> Optional["StagedMeshCorpus"]:
        """Lay out and shard the corpus over the mesh once; pass the handle
        to any operation for repeated scans without re-transfer (the mesh
        analogue of ``MatchEngine.stage`` — the serving pattern)."""
        data = utf8.to_u8(text)
        if len(data) == 0:
            return None
        plan, (streams_ts, warm, vend) = self._layout(data)
        spec_streams = NamedSharding(self.mesh, P(None, self._stream_axes))
        spec_vec = NamedSharding(self.mesh, P(self._stream_axes))
        return StagedMeshCorpus(
            plan=plan,
            streams_d=jax.device_put(streams_ts, spec_streams),
            warm_d=jax.device_put(warm, spec_vec),
            vend_d=jax.device_put(vend, spec_vec),
            warm_np=warm,
            vend_np=vend,
            data_np=data,
        )

    def _staged_of(self, text) -> Optional["StagedMeshCorpus"]:
        if text is None or isinstance(text, StagedMeshCorpus):
            return text
        return self.stage(text)

    def count_staged(self, staged: Optional["StagedMeshCorpus"]) -> int:
        if staged is None:
            return 0
        step, table_args = self._get_step(staged.plan.time_len, staged.plan.n_streams)
        try:
            # The step returns psum'd per-stream int32 counts; the exact
            # total is reduced here in host int64 (device int64 is
            # unavailable without jax_enable_x64).
            res = np.asarray(
                step(*table_args, staged.streams_d, staged.warm_d, staged.vend_d)
            )
            if (
                self._bitap_lay is not None
                and self._bitap_lay.has_trap
                and res.ndim == 3
            ):
                counts, trap = res[0], res[1]
                if (trap != 0).any():
                    # A length-changing unlowering occurs in the corpus.
                    # The planes are per-stream (not psum'd), so recovery
                    # is LOCALIZED: re-derive only trapped streams' counts
                    # from the raw corpus on the host (a few KiB each).
                    fixed = self._localized_trap_counts(staged, counts, trap)
                    if fixed is not None:
                        return fixed
                    # Too many trapped streams (or no host corpus): one
                    # full dense re-scan is the cheaper recovery.
                    dstep, dargs = self._get_dense_step(
                        staged.plan.time_len, staged.plan.n_streams
                    )
                    return int(
                        np.asarray(
                            dstep(*dargs, staged.streams_d, staged.warm_d,
                                  staged.vend_d)
                        ).sum(dtype=np.int64)
                    )
                return int(counts.sum(dtype=np.int64))
            return int(res.sum(dtype=np.int64))
        except (RuntimeError, NotImplementedError, ValueError):  # pragma: no cover
            if getattr(self, "_c16g", None) is None:
                raise
            # Mosaic/backend rejection of the comb16 inner: degrade to the
            # dense per-shard step for good instead of failing the scan.
            import warnings

            warnings.warn("distributed comb16 inner unavailable; "
                          "falling back to the dense per-shard kernel")
            self._c16g = None
            self._count_step = None
            step, table_args = self._get_step(
                staged.plan.time_len, staged.plan.n_streams
            )
            return int(
                np.asarray(
                    step(*table_args, staged.streams_d, staged.warm_d, staged.vend_d)
                ).sum(dtype=np.int64)
            )

    def count(self, text) -> int:
        return self.count_staged(self._staged_of(text))

    # -- localized CI trap recovery ----------------------------------------

    def _trapped_stream_idx(self, staged, trap: np.ndarray):
        """Trapped live stream ids, or None when the full dense re-scan is
        the cheaper recovery (same budget law as the single-chip engine:
        ops.bitap_scan.BitapAcEngine.TRAP_LOCAL_FRAC)."""
        from ..ops.bitap_scan import BitapAcEngine

        idx = np.flatnonzero(trap.reshape(-1) != 0)
        if len(idx) == 0 or staged.data_np is None:
            return None if len(idx) else idx
        live_n = int((staged.vend_np > 0).sum())
        if len(idx) > max(32, int(live_n * BitapAcEngine.TRAP_LOCAL_FRAC)):
            return None
        return idx

    def _host_trap_count(self, staged, s: int) -> int:
        from ..ops import bitap_scan as bs

        if not hasattr(self, "_host_exact_eng"):
            self._host_exact_eng = bs.make_host_exact(self.machine)
        return bs.host_stream_count(
            self.machine,
            self._host_exact_eng,
            staged.data_np,
            staged.plan.emit_len,
            staged.plan.n,
            staged.warm_np[s],
            s,
        )

    def _localized_trap_counts(self, staged, counts: np.ndarray, trap: np.ndarray):
        """Total count with trapped streams' values re-derived on the host
        from the raw corpus; None when localization is not worthwhile."""
        idx = self._trapped_stream_idx(staged, trap)
        if idx is None:
            return None
        fixed = counts.astype(np.int64).reshape(-1)
        for s in idx:
            fixed[s] = self._host_trap_count(staged, int(s))
        return int(fixed.sum())

    def _localized_trap_contains(self, staged, trap: np.ndarray):
        """containsAny verdict given no track hit but trapped streams: only
        those streams could hide a match.  None = fall back to dense."""
        idx = self._trapped_stream_idx(staged, trap)
        if idx is None:
            return None
        for s in idx:
            if self._host_trap_count(staged, int(s)) > 0:
                return True
        return False

    def _get_step(self, T: int, S: int):
        key = (T, S)
        if self._count_step is None:
            self._count_step = {}
        if key not in self._count_step:
            self._count_step[key] = self._build_count_step(T, S)
        return self._count_step[key]

    def _get_dense_step(self, T: int, S: int, sticky: bool = False):
        """The non-bitap per-shard step (dense/comb16 inner): the exact
        fallback program when a CI bitap trap fires on the mesh.  Compiled
        lazily — trap-free corpora never pay for it."""
        if self._count_step is None:
            self._count_step = {}
        key = ("dense-sticky", T, S) if sticky else ("dense", T, S)
        if key not in self._count_step:
            # use_bitap=False (not a temporary _bitap_lay mutation, which
            # would race a concurrent count/contains on this engine).
            self._count_step[key] = (
                self._build_contains_step(T, S, use_bitap=False)
                if sticky
                else self._build_count_step(T, S, use_bitap=False)
            )
        return self._count_step[key]

    # -- existence (sticky absorbing-state kernel) ---------------------------

    def _build_contains_step(self, T: int, S: int, use_bitap: bool = True):
        """Per-shard sticky (absorbing-state) scan: no count accumulation,
        psum of per-shard absorb flags — the mesh analogue of the
        single-chip existence kernel (``ops.pallas_scan._StickyView``)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops import pallas_scan as ps

        if self.inner == "pallas" and use_bitap and self._bitap_lay is not None:
            return self._build_bitap_contains_step(T, S)
        svs = [ps._StickyView(sm) for sm in self.sub_machines]
        comps = [ps.CompressedMachine.from_machine(sv, force_packing=1) for sv in svs]
        rows = max(c.rows for c in comps)
        if self._c16g is not None:
            # Uniform comb16 sticky step — only when it actually beats the
            # dense sticky chain's gather count.
            step = self._try_build_c16_contains_step(T, S, rows)
            if step is not None:
                return step
        cms = np.stack([np.resize(c.classmap, 256).reshape(2, 128) for c in comps])
        tabs = np.zeros((len(comps), rows, 128), dtype=np.int32)
        absorbs = np.zeros((len(comps), 1), dtype=np.int32)
        for g, (sv, c) in enumerate(zip(svs, comps)):
            tabs[g, : c.rows] = c.packed.reshape(c.rows, 128)
            absorbs[g, 0] = sv.absorb * c.k
        fold = all(
            bool((np.resize(c.classmap, 256)[127:] == c.classmap[127]).all())
            for c in comps
        )
        in_range = max(c.n_states * c.k for c in comps) <= 128
        wpairs = (
            ps._classmap_wpairs(np.resize(comps[0].classmap, 256))
            if len(comps) == 1
            else None
        )
        mesh, stream_axes, all_axes = self.mesh, self._stream_axes, self._all_axes
        S_local = S // self.n_stream_shards
        R_local = S_local // 128
        t_tile = 128 if T % 128 == 0 else T
        n_tiles = T // t_tile
        unroll = ps._fit_unroll(8 if rows <= 8 else (4 if rows <= 16 else 2), t_tile)
        kernel = ps._make_contains_kernel(
            t_tile, R_local, rows, n_tiles, unroll, 1,
            packing=1, fold=fold, in_range=in_range, wpairs=wpairs,
        )

        interp = self._interpret

        def per_shard(cm, tab, absorb, streams, warm, vend):
            big = jnp.int32(2**31 - 1)
            nzmin = jnp.min(jnp.where(vend > 0, vend, big))
            bmin = jnp.where(jnp.any(vend > 0), nzmin, 0)
            bscal = jnp.stack([warm.max(), bmin]).astype(jnp.int32)
            out = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (t_tile, R_local, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R_local, 128), jnp.int32),
                scratch_shapes=[pltpu.VMEM((R_local, 128), jnp.int32)],
                interpret=interp,
            )(bscal, cm[0], tab[0], vend.reshape(R_local, 128),
              streams.reshape(T, R_local, 128))
            live = vend.reshape(R_local, 128) > 0
            hit = jnp.where(live, out == absorb[0, 0], False)
            return jax.lax.psum(hit.sum().astype(jnp.int32), all_axes)

        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("needle"), P("needle"), P("needle"),
                      P(None, stream_axes), P(stream_axes), P(stream_axes)),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn), (jnp.asarray(cms.astype(np.int32)), jnp.asarray(tabs),
                             jnp.asarray(absorbs))

    def contains_any(self, text) -> bool:
        """Mesh-wide existence.  On the Pallas inner this runs the sticky
        absorbing-state kernel per shard (no count ops, cf. the reference's
        ``Done True`` early-exit fold, ``AhoCorasick/Searcher.hs:156-164``);
        the XLA inner answers via the count step."""
        staged = self._staged_of(text)
        if staged is None:
            return False
        if self.inner != "pallas":
            return self.count_staged(staged) > 0
        key = ("contains", staged.plan.time_len, staged.plan.n_streams)
        if self._count_step is None:
            self._count_step = {}
        if key not in self._count_step:
            self._count_step[key] = self._build_contains_step(
                staged.plan.time_len, staged.plan.n_streams
            )
        fn, table_args = self._count_step[key]
        try:
            res = np.asarray(
                fn(*table_args, staged.streams_d, staged.warm_d, staged.vend_d)
            )
            if (
                self._bitap_lay is not None
                and self._bitap_lay.has_trap
                and res.ndim == 3
            ):
                hits, trap = res[0], res[1]
                if (hits != 0).any():
                    return True  # a track hit is genuine even under traps
                if (trap != 0).any():
                    got = self._localized_trap_contains(staged, trap)
                    if got is not None:
                        return got
                    dfn, dargs = self._get_dense_step(
                        staged.plan.time_len, staged.plan.n_streams, sticky=True
                    )
                    return int(np.asarray(
                        dfn(*dargs, staged.streams_d, staged.warm_d,
                            staged.vend_d)
                    )) > 0
                return False
            return int(res) > 0
        except (RuntimeError, NotImplementedError, ValueError):  # pragma: no cover
            if getattr(self, "_c16g", None) is None:
                raise
            import warnings

            warnings.warn("distributed comb16 sticky inner unavailable; "
                          "falling back to the dense per-shard kernel")
            self._c16g = None
            self._count_step = None
            if hasattr(self, "_sticky16"):
                del self._sticky16
            return self.contains_any(staged)

    def contains_staged(self, staged: Optional["StagedMeshCorpus"]) -> bool:
        """Staged-handle alias of :meth:`contains_any` — gives the mesh
        engine the same duck surface as the single-chip Pallas engines, so
        :class:`ops.streaming.StreamingScanner` composes directly (out-of-
        core corpora feeding the whole mesh, chunk by chunk)."""
        return self.contains_any(staged)

    # -- positions ---------------------------------------------------------

    def _states_per_group(self, staged: "StagedMeshCorpus") -> np.ndarray:
        """[G, T, S] per-position states, one slice per needle group (the
        whole machine when the needle axis is trivial)."""
        plan = staged.plan
        key = ("states", plan.time_len, plan.n_streams)
        if self._count_step is None:
            self._count_step = {}
        if key not in self._count_step:
            mesh, stream_axes = self.mesh, self._stream_axes
            if self.inner == "pallas":
                # Per-shard Pallas states kernel (the lax.scan gather loop
                # is ~3 orders of magnitude slower on TPU).
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                from ..ops import pallas_scan as ps

                T, S = plan.time_len, plan.n_streams
                S_local = S // self.n_stream_shards
                R_local = S_local // 128
                t_tile = 128 if T % 128 == 0 else T
                n_tiles = T // t_tile
                unroll = 8
                while t_tile % unroll:
                    unroll //= 2
                kernel = ps._make_states_kernel(
                    t_tile, R_local, self._rows, unroll, 1,
                    fold=self._fold, in_range=self._in_range, wpairs=self._wpairs,
                )
                rows = self._rows
                interp = self._interpret
                kks = jnp.asarray(
                    [[int(np.asarray(self._cms[g]).max()) + 1]
                     for g in range(len(self.sub_machines))],
                    dtype=jnp.int32,
                )

                def per_shard(cm, tab, kk, streams):
                    out = pl.pallas_call(
                        kernel,
                        grid=(n_tiles,),
                        in_specs=[
                            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                            pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                            pl.BlockSpec(
                                (t_tile, R_local, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM,
                            ),
                        ],
                        out_specs=pl.BlockSpec(
                            (t_tile, R_local, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        out_shape=jax.ShapeDtypeStruct((T, R_local, 128), jnp.int32),
                        scratch_shapes=[pltpu.VMEM((R_local, 128), jnp.int32)],
                        interpret=interp,
                    )(cm[0], tab[0], streams.reshape(T, R_local, 128))
                    # Decode packed values to this group's state ids on-device.
                    return ((out & ps._STATE_MASK) // kk[0, 0]).reshape(1, T, S_local)

                table_args = (self._cms, self._tabs, kks)
                table_specs = (P("needle"), P("needle"), P("needle"))
            else:
                table_args = (self._deltas,)
                table_specs = (P("needle"),)

                def per_shard(delta, streams):
                    return local_scan_states(delta[0], streams)[None]

            fn = jax.jit(
                jax.shard_map(
                    per_shard,
                    mesh=mesh,
                    in_specs=table_specs + (P(None, stream_axes),),
                    out_specs=P("needle", None, stream_axes),
                    # pallas_call's out_shape carries no varying-axes metadata.
                    check_vma=False,
                )
            )
            self._count_step[key] = (fn, table_args)
        fn, table_args = self._count_step[key]
        return np.asarray(fn(*table_args, staged.streams_d))

    def _bits_per_group(self, staged: "StagedMeshCorpus"):
        """[G, S] per-stream counts and [G, T//32, S] hit bitmaps from ONE
        mesh scan — 1 bit per position (1/8 B per input byte, 1/32 of the
        states path's 4 B) of device->host traffic (the mesh analogue of the
        single-chip match-bitmap compaction,
        ``ops.pallas_scan.make_matchbits_kernel``).
        None when the bitmap route is unavailable (non-pallas inner,
        indivisible tiles, or no host byte copy)."""
        plan = staged.plan
        T, S = plan.time_len, plan.n_streams
        t_tile = 128 if T % 128 == 0 else T
        if self.inner != "pallas" or t_tile % 32 or staged.data_np is None:
            return None
        key = ("bits", T, S)
        if self._count_step is None:
            self._count_step = {}
        if key not in self._count_step:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            from ..ops import pallas_scan as ps

            mesh, stream_axes = self.mesh, self._stream_axes
            S_local = S // self.n_stream_shards
            R_local = S_local // 128
            n_tiles = T // t_tile
            rows = self._rows
            interp = self._interpret
            step_factory = ps.dense_bits_step_factory(
                rows, 1, self._in_range, self._fold, self._wpairs, interp,
                ps._STATE_BITS, ps._STATE_MASK,
            )

            kernel = ps.make_matchbits_kernel(t_tile, R_local, step_factory, n_tiles)

            def per_shard(cm, tab, streams, warm, vend):
                big = jnp.int32(2**31 - 1)
                nzmin = jnp.min(jnp.where(vend > 0, vend, big))
                bmin = jnp.where(jnp.any(vend > 0), nzmin, 0)
                bscal = jnp.stack([warm.max(), bmin]).astype(jnp.int32)
                counts, bits = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile, R_local, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=(
                        pl.BlockSpec((R_local, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(
                            (t_tile // 32, R_local, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((R_local, 128), jnp.int32),
                        jax.ShapeDtypeStruct((T // 32, R_local, 128), jnp.int32),
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((R_local, 128), jnp.int32),
                        pltpu.VMEM((R_local, 128), jnp.int32),
                    ],
                    interpret=interp,
                )(
                    bscal, cm[0], tab[0],
                    warm.reshape(R_local, 128), vend.reshape(R_local, 128),
                    streams.reshape(T, R_local, 128),
                )
                live = vend.reshape(R_local, 128) > 0
                counts = jnp.where(live, counts, 0)
                return counts.reshape(1, S_local), bits.reshape(1, T // 32, S_local)

            fn = jax.jit(
                jax.shard_map(
                    per_shard,
                    mesh=mesh,
                    in_specs=(P("needle"), P("needle"))
                    + (P(None, stream_axes), P(stream_axes), P(stream_axes)),
                    out_specs=(
                        P("needle", stream_axes),
                        P("needle", None, stream_axes),
                    ),
                    check_vma=False,
                )
            )
            self._count_step[key] = (fn, (self._cms, self._tabs))
        fn, table_args = self._count_step[key]
        counts, bits = fn(*table_args, staged.streams_d, staged.warm_d, staged.vend_d)
        return np.asarray(counts, dtype=np.int64), np.asarray(bits)

    def _hits_per_group(self, staged: "StagedMeshCorpus"):
        """Per needle group: (global end positions ascending, entered state
        ids) via the mesh bitmap scan; hit states re-derived exactly from
        the raw bytes (``ops.pallas_scan.states_at_positions``).  None when
        the bitmap route is unavailable (callers use the states path)."""
        got = self._bits_per_group(staged)
        if got is None:
            return None
        counts_np, bits_np = got
        from ..ops.pallas_scan import expand_hit_bits, states_at_positions

        warm = staged.warm_np.astype(np.int64)
        vend = staged.vend_np.astype(np.int64)
        L = staged.plan.emit_len
        out = []
        for g, sub in enumerate(self.sub_machines):
            bits = bits_np[g]
            w, s = np.nonzero(bits)
            if len(w) == 0:
                out.append((np.zeros(0, np.int64), np.zeros(0, np.int64)))
                continue
            vals = bits[w, s].astype(np.int64) & 0xFFFFFFFF
            pos = expand_hit_bits(w, s, vals, warm, vend, L)
            states = states_at_positions(sub, staged.data_np, pos)
            # Conformance: total matches at the hit positions must equal the
            # kernel's exactly-masked count (a bit can carry several matches
            # — states with match_count >= 2).
            got = int(sub.match_count[states].sum())
            assert got == int(counts_np[g].sum()), (
                "mesh bitmap/count mismatch", g, got, int(counts_np[g].sum()),
            )
            order = np.argsort(pos, kind="stable")
            out.append((pos[order], states[order].astype(np.int64)))
        return out

    def _assemble_flat(self, staged: "StagedMeshCorpus", states_ts: np.ndarray):
        """Per-position states in corpus order from one group's [T, S]
        time-major array (emission regions re-based by stream offset)."""
        plan, warm = staged.plan, staged.warm_np
        n, S, L = plan.n, plan.n_streams, plan.emit_len
        flat = np.empty(n, dtype=np.int32)
        for i in range(S):
            emit_begin = i * L
            if emit_begin >= n:
                break
            emit_end = min(emit_begin + L, n)
            flat[emit_begin:emit_end] = states_ts[
                warm[i] : warm[i] + (emit_end - emit_begin), i
            ]
        return flat

    def matches_arrays(self, text):
        """(ends, value_ids) identical to the single-chip scan for ANY mesh
        shape: per-shard states are computed under shard_map (stream shards
        re-derive exact state from their warm-up overlap; needle groups scan
        independently), positions re-base by stream offset during assembly,
        and cross-group matches merge by ``(end, -needle_byte_len)`` — the
        reference's same-end emission order is own (longest) needle first
        then strictly shorter failure-chain suffixes
        (``src/Data/Text/AhoCorasick/Automaton.hs:367-380``), and same-end
        same-length needles are byte-identical, hence in one group.

        Accepts a raw haystack or a :class:`StagedMeshCorpus` handle."""
        from ..ops.pallas_scan import _expand_outputs
        from ..ops.xla_scan import extract_matches

        staged = self._staged_of(text)
        if staged is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        hits = self._hits_per_group(staged)  # bitmap route: 1/8 B per byte
        states_g = None if hits is not None else self._states_per_group(staged)
        all_ends: List[np.ndarray] = []
        all_vids: List[np.ndarray] = []
        for g, sub in enumerate(self.sub_machines):
            if hits is not None:
                pos, hstates = hits[g]
                ends, local_vids = _expand_outputs(sub, pos, hstates)
            else:
                flat = self._assemble_flat(staged, states_g[g])
                ends, local_vids = extract_matches(sub, flat)
            vid_map = np.asarray(self.vid_groups[g], dtype=np.int64)
            all_ends.append(ends)
            all_vids.append(vid_map[local_vids])
        ends = np.concatenate(all_ends)
        vids = np.concatenate(all_vids)
        if len(ends) == 0 or self.n_needle_groups == 1:
            return ends.astype(np.int64), vids.astype(np.int32)
        lens = np.fromiter(
            (len(self.machine.needles[int(v)]) for v in vids), np.int64, len(vids)
        )
        order = np.lexsort((-lens, ends))  # end asc, longer needle first
        return ends[order].astype(np.int64), vids[order].astype(np.int32)

    def matches_arrays_staged(self, staged: Optional["StagedMeshCorpus"]):
        """Staged-handle alias of :meth:`matches_arrays` (same duck surface
        as the single-chip engines for :class:`StreamingScanner`)."""
        return self.matches_arrays(staged)

    def value_presence(self, text, n_values: Optional[int] = None) -> np.ndarray:
        """bool [n_values] — which values matched anywhere on the mesh (the
        distributed ``containsAll`` primitive: all() of this vector is the
        reference's ``Searcher.containsAll``)."""
        if n_values is None:
            n_values = len(self.machine.values)
        present = np.zeros(n_values, dtype=bool)
        staged = self._staged_of(text)
        if staged is None:
            return present
        hits = self._hits_per_group(staged)
        states_g = None if hits is not None else self._states_per_group(staged)
        for g, sub in enumerate(self.sub_machines):
            if hits is not None:
                hit_states = hits[g][1]
            else:
                flat = self._assemble_flat(staged, states_g[g])
                hit_states = flat[sub.match_count[flat] > 0]
            vid_map = np.asarray(self.vid_groups[g], dtype=np.int64)
            subp = ac.presence_of_states(sub, hit_states, len(sub.values))
            present[vid_map[np.flatnonzero(subp)]] = True
        return present

    def contains_all(self, text) -> bool:
        """Distributed ``containsAll`` (``AhoCorasick/Searcher.hs:173-187``)."""
        return bool(self.value_presence(text).all())


@dataclass
class StagedMeshCorpus:
    """Mesh-sharded corpus staging handle (streams laid out once, reused by
    count / contains / matches / presence)."""

    plan: StreamPlan
    streams_d: Any
    warm_d: Any
    vend_d: Any
    warm_np: np.ndarray
    #: Host copies for the match-bitmap extraction path (raw bytes for the
    #: window-DFA state re-derivation; vend for hit filtering).
    vend_np: np.ndarray = None
    data_np: np.ndarray = None


__all__ = ["DistributedAcEngine", "StagedMeshCorpus", "make_mesh"]
