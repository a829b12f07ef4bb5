"""Per-shard scan bodies used inside ``shard_map`` (no jit of their own —
the distributed step jits the whole mapped function)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_scan_counts(delta_flat, mc, streams_ts, warm_start, valid_end):
    """Per-stream match counts for one shard's streams ([T, S_local])."""
    def step(carry, byte_row):
        states, counts, t = carry
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        c = jnp.take(mc, states)
        valid = (t >= warm_start) & (t < valid_end)
        counts = counts + jnp.where(valid, c, 0)
        return (states, counts, t + 1), None

    # Derive the carry init from the (possibly shard_map-varying) inputs so
    # its varying-axes type matches the loop output under shard_map (the
    # table arguments vary over the needle axis, the streams over data/seq).
    zeros = (streams_ts[0] * 0 + delta_flat[0] * 0).astype(jnp.int32)
    init = (zeros, zeros, jnp.int32(0))
    (_, counts, _), _ = jax.lax.scan(step, init, streams_ts)
    return counts


def local_scan_states(delta_flat, streams_ts):
    """Per-position states for one shard's streams."""
    def step(states, byte_row):
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        return states, states

    # Carry init varies over the same mesh axes as both inputs (see
    # local_scan_counts).
    zeros = (streams_ts[0] * 0 + delta_flat[0] * 0).astype(jnp.int32)
    _, states_ts = jax.lax.scan(step, zeros, streams_ts)
    return states_ts
