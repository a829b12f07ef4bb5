"""Multi-chip corpus sharding over a ``jax.sharding.Mesh``.

The reference is strictly single-threaded (SURVEY.md §2.4); this module is
the TPU-native replacement for the parallelism it lacks: the corpus is
decomposed into overlap-warmed streams (``ops.xla_scan.plan_streams`` — the
same exact-state-reconstruction argument), the streams are sharded across
the mesh's ``data`` axis (independent documents / corpus shards) and the
``seq`` axis (chunks of one long document — sequence parallelism for a DFA
scan *is* chunk-overlap decomposition, since the state at any position
depends on at most ``max_needle_bytes`` of history), the automaton tables
are replicated (they are small after byte-class compression), and per-shard
match counts are reduced with ``jax.lax.psum`` over ICI.

Determinism: every input position is emitted by exactly one stream
regardless of mesh shape, so counts and match sets are identical to the
single-chip result bit-for-bit; position lists are re-based by shard offset.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ac import AcMachine
from ..utils import utf8
from .xla_scan_local import local_scan_counts, local_scan_states

from ..ops.xla_scan import StreamPlan, build_streams, plan_streams


def make_mesh(
    devices=None, data: Optional[int] = None, seq: int = 1
) -> Mesh:
    """A (data, seq) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    assert data * seq == n, f"mesh {data}x{seq} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, ("data", "seq"))


class DistributedAcEngine:
    """Data-parallel AC matching over a device mesh.

    Streams are laid out exactly as in the single-device engines, then the
    stream axis is sharded over mesh axes (data, seq); the jitted step psums
    per-shard counts so every device returns the global count.
    """

    def __init__(self, machine: AcMachine, mesh: Mesh):
        self.machine = machine
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.overlap = max(0, machine.max_needle_bytes - 1)
        self.delta_flat = jnp.asarray(machine.delta.reshape(-1), dtype=jnp.int32)
        self.match_count = jnp.asarray(machine.match_count, dtype=jnp.int32)
        self._count_step = self._build_count_step()

    def _build_count_step(self):
        mesh = self.mesh

        def per_shard(delta_flat, mc, streams, warm, vend):
            # streams: [T, S_local] on each device
            counts = local_scan_counts(delta_flat, mc, streams, warm, vend)
            local_total = counts.sum()
            return jax.lax.psum(
                jax.lax.psum(local_total, "seq"), "data"
            )

        shard_fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(None, ("data", "seq")), P(("data", "seq")), P(("data", "seq"))),
            out_specs=P(),
        )
        return jax.jit(shard_fn)

    def _layout(self, data: np.ndarray):
        """Streams padded so the stream count divides the device count."""
        plan = plan_streams(
            len(data),
            self.overlap,
            n_streams=None,
            max_streams=max(1024, 8 * self.n_devices),
        )
        s = plan.n_streams
        s = -(-s // self.n_devices) * self.n_devices
        plan = StreamPlan(
            n=plan.n,
            n_streams=s,
            emit_len=-(-plan.n // s),
            overlap=plan.overlap,
            time_len=-(-plan.n // s) + plan.overlap,
        )
        return plan, build_streams(data, plan)

    def count(self, text: utf8.TextLike) -> int:
        data = utf8.to_u8(text)
        if len(data) == 0:
            return 0
        plan, (streams_ts, warm, vend) = self._layout(data)
        spec_streams = NamedSharding(self.mesh, P(None, ("data", "seq")))
        spec_vec = NamedSharding(self.mesh, P(("data", "seq")))
        streams_d = jax.device_put(jnp.asarray(streams_ts), spec_streams)
        warm_d = jax.device_put(jnp.asarray(warm), spec_vec)
        vend_d = jax.device_put(jnp.asarray(vend), spec_vec)
        total = self._count_step(
            self.delta_flat, self.match_count, streams_d, warm_d, vend_d
        )
        return int(np.asarray(total))


__all__ = ["DistributedAcEngine", "make_mesh"]
