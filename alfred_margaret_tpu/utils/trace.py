"""Tracing / profiling / observability helpers (SURVEY.md §5.1, §5.5).

The reference has none of this in-library (profiling was offline GHC Core
reading); production TPU deployment wants it first-class:

* :func:`profile` — context manager around any scan, wiring up the JAX
  profiler (``jax.profiler.trace``) when a trace dir is given and always
  reporting wall time + bytes/s.
* :class:`ScanStats` — per-engine counters (bytes scanned, scans, wall
  seconds) that high-level code can aggregate and export.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Iterator, Optional


@dataclass
class ScanStats:
    bytes_scanned: int = 0
    scans: int = 0
    seconds: float = 0.0

    @property
    def bytes_per_second(self) -> float:
        return self.bytes_scanned / self.seconds if self.seconds else 0.0

    def record(self, n_bytes: int, seconds: float) -> None:
        self.bytes_scanned += n_bytes
        self.scans += 1
        self.seconds += seconds

    def as_dict(self) -> dict:
        return {
            "bytes_scanned": self.bytes_scanned,
            "scans": self.scans,
            "seconds": round(self.seconds, 6),
            "bytes_per_second": round(self.bytes_per_second, 1),
        }


#: Module-level aggregate, recorded by engines when tracing is enabled.
GLOBAL_STATS = ScanStats()


@contextlib.contextmanager
def profile(
    n_bytes: int,
    label: str = "scan",
    trace_dir: Optional[str] = None,
    stats: Optional[ScanStats] = None,
) -> Iterator[ScanStats]:
    """Time a block, optionally under the JAX profiler.

    >>> with profile(len(data), trace_dir="/tmp/am-trace") as st:
    ...     searcher.count_matches(data)
    >>> st.bytes_per_second
    """
    local = ScanStats()
    ctx = contextlib.nullcontext()
    if trace_dir is not None:
        import jax

        ctx = jax.profiler.trace(trace_dir)
    t0 = time.perf_counter()
    with ctx:
        yield local
    dt = time.perf_counter() - t0
    local.record(n_bytes, dt)
    (stats or GLOBAL_STATS).record(n_bytes, dt)


__all__ = ["profile", "ScanStats", "GLOBAL_STATS"]
