"""Protocol-compatible count-matches benchmark binary.

Usage: ``python -m alfred_margaret_tpu.bench.countmatches FILE...``

Per the reference protocol (``benchmark/benchmark.py:10-24``): for each input
file print tab-separated nanoseconds per round (trailing tab) on stdout, one
line per file, and the match count once on stderr. Timing includes automaton
construction, like the reference's Haskell bench bin
(``benchmark/haskell/app/Main.hs:59-76``).

Environment knobs:
  AMT_ENGINE   = auto | python | xla | pallas | cpp   (default auto)
  AMT_ROUNDS   = rounds per file (default 5)
"""

from __future__ import annotations

import os
import sys
import time

from ..models import ac
from ..utils.case import CASE_SENSITIVE
from .dataformat import parse_bench_file


def count_with_engine(needles, haystack_bytes, engine: str) -> int:
    machine = ac.build([(n, ()) for n in needles])
    if engine == "cpp":
        from ..native.cpp_engine import CppAcEngine

        return CppAcEngine(machine).count(haystack_bytes)
    if engine == "pallas":
        from ..ops.pallas_scan import PallasAcEngine

        return PallasAcEngine(machine).count(haystack_bytes)
    if engine == "xla":
        from ..ops.xla_scan import XlaAcEngine

        return XlaAcEngine(machine).count(haystack_bytes)
    if engine == "python":
        return ac.count_matches(machine, haystack_bytes)
    from ..engine import MatchEngine

    return MatchEngine(machine, "auto").count(haystack_bytes, CASE_SENSITIVE)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    engine = os.environ.get("AMT_ENGINE", "auto")
    if engine not in ("auto", "python", "xla", "pallas", "cpp"):
        print(f"unknown AMT_ENGINE {engine!r}", file=sys.stderr)
        return 2
    rounds = max(1, int(os.environ.get("AMT_ROUNDS", "5")))
    total_count = None
    for path in argv:
        needles, haystack = parse_bench_file(path)
        hay = haystack.encode("utf-8")
        times = []
        count = None
        for _ in range(rounds):
            t0 = time.perf_counter_ns()
            c = count_with_engine(needles, hay, engine)
            times.append(time.perf_counter_ns() - t0)
            if count is None:
                count = c
            elif count != c:
                print(f"inconsistent counts: {count} vs {c}", file=sys.stderr)
                return 1
        sys.stdout.write("".join(f"{t}\t" for t in times) + "\n")
        total_count = (total_count or 0) + count
    if total_count is not None:
        print(total_count, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
