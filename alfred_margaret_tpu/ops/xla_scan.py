"""XLA scan engine: jittable gather-per-byte DFA matching over many streams.

The reference's hot loop is a scalar fold with data-dependent control flow
(``AhoCorasick/Automaton.hs:442-534``) — unmappable to TPU. This engine
restructures matching as a **batched vector scan**: one haystack is split
into S parallel streams (chunks) with a warm-up overlap of
``max_needle_bytes - 1`` bytes, and a single ``lax.scan`` advances all S DFA
states at once with one table gather per byte column:

    states = delta_flat[states * 256 + byte_column]      # [S] gather
    counts += match_count[states] * valid_mask           # [S] gather + add

The overlap trick is exact: an Aho-Corasick DFA state is the longest suffix
of the consumed input that is a trie path, and trie paths are at most
``max_needle_bytes`` long, so the state at any position is fully determined
by the last ``max_needle_bytes`` bytes. Warm-up positions are masked out of
emission; every input position is emitted by exactly one stream.

This is the correctness-first jittable path (runs on CPU and a single TPU
chip); the Pallas kernel in ``pallas_scan.py`` is the bytes/s workhorse with
the same semantics, and ``parallel/`` shards streams across a device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ac import AcMachine
from ..utils import utf8


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _ceil_div(x, m) * m


@dataclass(frozen=True)
class StreamPlan:
    """How a flat byte array is laid out into overlap-warmed streams."""

    n: int  # total input bytes
    n_streams: int  # S
    emit_len: int  # L: emission bytes per stream (last stream may emit less)
    overlap: int  # K: warm-up bytes (max_needle_bytes - 1)
    time_len: int  # T = K + L, padded stream length


def plan_streams(
    n: int,
    overlap: int,
    n_streams: Optional[int] = None,
    max_streams: int = 1024,
    min_emit: int = 512,
) -> StreamPlan:
    """Choose a stream decomposition for an ``n``-byte input.

    More streams = more TPU lane parallelism but more warm-up overhead
    (``overlap`` extra bytes per stream). We aim for full lanes while keeping
    the overlap overhead and padding waste small.
    """
    if n <= 0:
        return StreamPlan(n=n, n_streams=1, emit_len=1, overlap=overlap, time_len=1 + overlap)
    if n_streams is None:
        # Overlap work should stay under ~12.5% of emission work.
        by_overlap = n // max(1, 8 * overlap) if overlap > 0 else max_streams
        n_streams = int(min(max_streams, max(1, min(n // min_emit, by_overlap))))
        if n_streams >= 8:
            n_streams = max(8, (n_streams // 8) * 8)
    n_streams = max(1, min(n_streams, n))
    emit_len = _ceil_div(n, n_streams)
    return StreamPlan(
        n=n,
        n_streams=n_streams,
        emit_len=emit_len,
        overlap=overlap,
        time_len=emit_len + overlap,
    )


def _stream_validity(n: int, S: int, L: int, K: int):
    """Per-stream (warm_start, valid_end) int32 arrays.

    Emission is valid for t in [warm_start, valid_end).  Fully-padded
    streams (emit_begin >= n: no emission at all) get warm = vend = 0 so
    masked kernels freeze them outright and boundary scalars can be
    computed over live streams only — their windows are right-padding
    zeros, which must never be scanned live (needles may contain NUL
    bytes; their counts/absorbs are excluded at reduction too)."""
    idx = np.arange(S, dtype=np.int64)
    emit_begin = idx * L
    emit_end = np.minimum(emit_begin + L, n)
    warm_start = np.minimum(K, emit_begin)
    valid_end = warm_start + np.maximum(0, emit_end - emit_begin)
    empty = emit_begin >= n
    warm_start[empty] = 0
    valid_end[empty] = 0
    return warm_start.astype(np.int32), valid_end.astype(np.int32)


def build_streams(data: np.ndarray, plan: StreamPlan) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lay out ``data`` into time-major streams.

    Returns ``(streams_ts, warm_start, valid_end)`` where ``streams_ts`` is
    uint8 [T, S] (time-major: scan slices are contiguous lane vectors),
    and per-stream emission is valid for t in [warm_start[s], valid_end[s]).
    """
    n, S, L, K, T = plan.n, plan.n_streams, plan.emit_len, plan.overlap, plan.time_len
    data = np.ascontiguousarray(data, dtype=np.uint8)
    # Vectorized sliding windows over a zero-padded buffer: stream i reads
    # data[i*L - K : i*L - K + T].  The left pad makes the striding uniform;
    # stream 0 is then fixed up to start at data[0] (zero padding must never
    # be scanned inside a warm-up region that feeds emission state: needles
    # may contain NUL bytes).
    pad = np.zeros(K + max((S - 1) * L + T, n), dtype=np.uint8)
    pad[K : K + n] = data
    windows = np.lib.stride_tricks.sliding_window_view(pad, T)[:: max(1, L)][:S]
    streams = windows.T.copy()  # [T, S] (copy: the window view is read-only)
    # Streams whose emit start is within K of the text head would otherwise
    # scan left-padding zeros; they read from data[0] instead (matching the
    # reference layout: start = max(0, i*L - K)).
    n_fix = 1 if L >= K else min(S, _ceil_div(K, L))
    for i in range(n_fix):
        streams[:, i] = pad[K : K + T]
    warm_start, valid_end = _stream_validity(n, S, L, K)
    # Zero every stream's window tail beyond its valid end: with T padded
    # up to a tile multiple (and for the fixed-up head streams), the tail
    # would otherwise hold REAL bytes belonging to later streams' emission,
    # which the zero-inert no-freeze fast path would double-count.  Pads
    # must be inert for every stream.
    streams[np.arange(T, dtype=np.int32)[:, None] >= valid_end[None, :]] = 0
    return streams, warm_start, valid_end


@partial(jax.jit, static_argnames=("L", "T", "S", "K", "n_fix"))
def _window_device(pad_dev, *, L: int, T: int, S: int, K: int, n_fix: int):
    """Device-side stream windowing: [T, S] u8 from the zero-padded corpus.

    streams[t, s] = pad[s*L + t] is a transpose of ``pad.reshape(rows, L)``
    followed by column-shifted slices — pure reshape/transpose/slice/concat,
    no gather (XLA gathers are ~0.2 GB/s on TPU; this path runs at HBM
    speed).  The first ``n_fix`` streams read from data[0] instead (their
    windows would otherwise scan left padding; cf. ``build_streams``).
    """
    rows = pad_dev.shape[0] // L
    m = pad_dev.reshape(rows, L).T  # [L, rows]
    segs = []
    t = 0
    while t < T:
        j = t // L
        seg_len = min(L, T - t)
        segs.append(jax.lax.slice(m, (0, j), (seg_len, j + S)))
        t += seg_len
    streams = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
    if n_fix:
        col = jax.lax.slice(pad_dev, (K,), (K + T,))
        streams = jax.lax.dynamic_update_slice(
            streams, jnp.broadcast_to(col[:, None], (T, n_fix)), (0, 0)
        )
    return streams


def stage_streams_device(data: np.ndarray, plan: StreamPlan):
    """Transfer the corpus once (raw bytes) and window it on-device.

    Returns (streams_dev [T, S] uint8 device array, warm_start, valid_end).
    Semantically identical to ``build_streams`` + transfer, but the host does
    no windowing work and the wire carries n + O(S*L) bytes.
    """
    n, S, L, K, T = plan.n, plan.n_streams, plan.emit_len, plan.overlap, plan.time_len
    rows = max(S + _ceil_div(T, L), _ceil_div(K + n, L)) + 1
    pad = np.zeros(rows * L, dtype=np.uint8)
    pad[K : K + n] = data
    pad_dev = jnp.asarray(pad)
    n_fix = 1 if L >= K else min(S, _ceil_div(K, L))
    streams_dev = _window_device(pad_dev, L=L, T=T, S=S, K=K, n_fix=n_fix)
    warm_start, valid_end = _stream_validity(n, S, L, K)
    # Zero every stream's window tail beyond its valid end (one fused
    # elementwise op; see build_streams — pads must be inert).
    t_idx = jnp.arange(T, dtype=jnp.int32)[:, None]
    streams_dev = jnp.where(
        t_idx >= jnp.asarray(valid_end)[None, :], jnp.uint8(0), streams_dev
    )
    return streams_dev, warm_start, valid_end


@dataclass
class AcDeviceMachine:
    """Device-resident automaton arrays, shared by the XLA and Pallas engines."""

    delta_flat: jax.Array  # int32 [n_states * 256]
    match_count: jax.Array  # int32 [n_states]
    n_states: int
    overlap: int  # max_needle_bytes - 1

    @staticmethod
    def from_machine(machine: AcMachine) -> "AcDeviceMachine":
        return AcDeviceMachine(
            delta_flat=jnp.asarray(machine.delta.reshape(-1), dtype=jnp.int32),
            match_count=jnp.asarray(machine.match_count, dtype=jnp.int32),
            n_states=machine.n_states,
            overlap=max(0, machine.max_needle_bytes - 1),
        )


@jax.jit
def _scan_count(delta_flat, match_count, streams_ts, warm_start, valid_end):
    """Total match count over all streams (warm-up masked)."""
    S = streams_ts.shape[1]

    def step(carry, byte_row):
        states, counts, t = carry
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        c = jnp.take(match_count, states)
        valid = (t >= warm_start) & (t < valid_end)
        counts = counts + jnp.where(valid, c, 0)
        return (states, counts, t + 1), None

    init = (
        jnp.zeros(S, dtype=jnp.int32),
        jnp.zeros(S, dtype=jnp.int32),
        jnp.int32(0),
    )
    (_, counts, _), _ = jax.lax.scan(step, init, streams_ts)
    # Per-stream counts are int32 (a stream would need 2^31 matches to
    # overflow); the cross-stream sum happens in int64 on the host.
    return counts


@jax.jit
def _scan_states(delta_flat, streams_ts):
    """Per-position DFA states for all streams: [T, S] int32."""
    S = streams_ts.shape[1]

    def step(states, byte_row):
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        return states, states

    _, states_ts = jax.lax.scan(step, jnp.zeros(S, dtype=jnp.int32), streams_ts)
    return states_ts


@jax.jit
def _scan_state_hits(delta_flat, n_states_arr, streams_ts, warm_start, valid_end):
    """Bool [n_states] mask of states visited at valid emission positions
    (for containsAll: a needle is present iff any visited state emits it)."""
    S = streams_ts.shape[1]
    hits0 = jnp.zeros(n_states_arr.shape[0], dtype=jnp.bool_)

    def step(carry, byte_row):
        states, hits, t = carry
        states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
        valid = (t >= warm_start) & (t < valid_end)
        hits = hits.at[jnp.where(valid, states, 0)].set(True)
        return (states, hits, t + 1), None

    (_, hits, _), _ = jax.lax.scan(step, (jnp.zeros(S, dtype=jnp.int32), hits0, jnp.int32(0)), streams_ts)
    return hits


class XlaAcEngine:
    """End-to-end matcher over a single device using ``lax.scan``.

    Stream layout happens on host (numpy); the scan is jitted and cached per
    (T, S) shape. ``bucket`` pads T up to powers of two so the number of
    distinct compiled shapes stays logarithmic.
    """

    def __init__(self, machine: AcMachine, max_streams: int = 1024, bucket: bool = True):
        self.machine = machine
        self.dev = AcDeviceMachine.from_machine(machine)
        self.max_streams = max_streams
        self.bucket = bucket

    def _streams(self, data: np.ndarray, n_streams: Optional[int] = None):
        plan = plan_streams(len(data), self.dev.overlap, n_streams, self.max_streams)
        if self.bucket:
            bucketed_emit = max(1, _round_up(plan.emit_len, 512))
            plan = StreamPlan(
                n=plan.n,
                n_streams=plan.n_streams,
                emit_len=bucketed_emit,
                overlap=plan.overlap,
                time_len=bucketed_emit + plan.overlap,
            )
        return plan, build_streams(data, plan)

    def count(self, text: utf8.TextLike) -> int:
        data = utf8.to_u8(text)
        if len(data) == 0:
            return 0
        _, (streams_ts, warm, vend) = self._streams(data)
        counts = _scan_count(self.dev.delta_flat, self.dev.match_count, streams_ts, warm, vend)
        return int(np.asarray(counts, dtype=np.int64).sum())

    def final_states(self, text: utf8.TextLike) -> np.ndarray:
        """int32 [n] DFA state after consuming each byte of ``text``."""
        data = utf8.to_u8(text)
        n = len(data)
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        plan, (streams_ts, warm, vend) = self._streams(data)
        states_ts = np.asarray(_scan_states(self.dev.delta_flat, streams_ts))
        # Stitch emission regions back into one flat array.
        out = np.empty(n, dtype=np.int32)
        L = plan.emit_len
        for i in range(plan.n_streams):
            emit_begin = i * L
            if emit_begin >= n:
                break
            emit_end = min(emit_begin + L, n)
            out[emit_begin:emit_end] = states_ts[warm[i] : warm[i] + (emit_end - emit_begin), i]
        return out

    def state_hits(self, text: utf8.TextLike) -> np.ndarray:
        """bool [n_states]: which states were reached at emission positions."""
        data = utf8.to_u8(text)
        if len(data) == 0:
            return np.zeros(self.dev.n_states, dtype=bool)
        _, (streams_ts, warm, vend) = self._streams(data)
        hits = _scan_state_hits(
            self.dev.delta_flat,
            jnp.zeros(self.dev.n_states, dtype=jnp.bool_),  # shape carrier only
            streams_ts,
            warm,
            vend,
        )
        hits = np.array(hits)
        # Position-0 scatter writes state 0 for invalid lanes; state 0 never
        # emits so it is harmless, but normalize for cleanliness.
        hits[0] = False
        return hits


def expand_hits(
    machine: AcMachine, ends: np.ndarray, hit_states: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand hit (end-position, state) pairs into (ends, value_ids) with
    CSR (emission) order within a position — the scalar fold's ordering."""
    if len(ends) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
    hit_counts = machine.match_count[hit_states]
    positions = np.repeat(np.asarray(ends, dtype=np.int64), hit_counts)
    offs = machine.out_offset[hit_states]
    total = int(hit_counts.sum())
    base = np.repeat(offs, hit_counts)
    ramp = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(hit_counts) - hit_counts, hit_counts
    )
    value_ids = machine.out_values[base + ramp]
    return positions, value_ids


def extract_matches(
    machine: AcMachine, states: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand per-position states into (positions_one_past_end, value_ids).

    Positions ascend; same-position values keep CSR (emission) order, exactly
    matching the scalar fold's ordering.
    """
    counts = machine.match_count[states]
    hit_pos = np.flatnonzero(counts)
    if len(hit_pos) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
    return expand_hits(machine, hit_pos + 1, states[hit_pos])


__all__ = [
    "AcDeviceMachine",
    "StreamPlan",
    "XlaAcEngine",
    "plan_streams",
    "build_streams",
    "extract_matches",
    "expand_hits",
]
