"""Summarize .stats files: mean ± stdev and min, summed over files per run
(mirrors ``benchmark/report.py:13-31``)."""

from __future__ import annotations

import statistics
import sys


def summarize(path: str) -> str:
    per_run_totals = []
    with open(path) as f:
        lines = [l for l in f.read().split("\n") if l.strip()]
    # Lines alternate per (run, file); reference sums over files per run.
    runs: dict = {}
    n_files = None
    # The stats file holds `runs` blocks each with one line per file.
    # Reconstruct by counting distinct line counts.
    times = [[int(t) for t in l.split("\t") if t] for l in lines]
    # Each line already holds all rounds for one file (one program invocation
    # = rounds per file); sum per round index across files.
    n_rounds = min(len(t) for t in times)
    totals = [sum(t[i] for t in times) / 1e9 for i in range(n_rounds)]
    mean = statistics.mean(totals)
    stdev = statistics.stdev(totals) if len(totals) > 1 else 0.0
    return f"{path}: mean {mean:.3f} ± {stdev:.3f} s, min {min(totals):.3f} s"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    for path in argv:
        print(summarize(path))


if __name__ == "__main__":
    main()
