"""Headline benchmark: AC count-all-matches bytes/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: the BASELINE.json config-1 needle set (tshirt/shirts/shorts,
CaseSensitive) over a synthetic corpus with ~1% needle hits.  ``value`` is
chip-side Pallas-kernel throughput in bytes/s, measured as the *slope*
between a low-rep and a high-rep device-resident scan (the reps grid
re-reads the resident streams inside one launch; min over ROUNDS, result
materialized every run) so fixed per-call overhead — which on a tunneled
device includes a ~30 ms host round-trip — cancels out.  ``vs_baseline`` is the speedup over the single-core native C++ DFA
engine on the same data on this host — the stand-in for the reference
implementation (same algorithm class, measured live so the ratio tracks
real hardware).

The TPU measurement runs in a watchdog subprocess (default 480 s,
``AM_BENCH_TIMEOUT``): a wedged device relay gets SIGKILLed and the
benchmark still reports the multithreaded host-engine number instead of
hanging the driver.  ``AM_BENCH_INPROC=1`` disables the watchdog.

Environment knobs: AM_BENCH_MB (corpus MiB, default 128), AM_BENCH_ROUNDS.
"""

import json
import os
import sys
import time

import numpy as np

N_MB = int(os.environ.get("AM_BENCH_MB", "128"))
ROUNDS = int(os.environ.get("AM_BENCH_ROUNDS", "7"))
WATCHDOG_S = int(os.environ.get("AM_BENCH_TIMEOUT", "480"))
NEEDLES = ["tshirt", "shirts", "shorts"]

_T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[bench {time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _time_device_scan(eng, data: np.ndarray, reps: int):
    """Stage data on device, return (best seconds over ROUNDS, count).

    Every run's result is materialized to host — on the axon relay,
    block_until_ready does not actually block, and letting executions queue
    up is pathologically slow.  ``reps`` re-scans the resident streams that
    many times inside one launch (count comes back ``reps *`` base).
    """
    import jax

    st = eng.stage(data)
    jax.block_until_ready(st.streams_dev)
    count = None
    best = float("inf")
    for i in range(ROUNDS + 1):  # first run = compile/warmup, untimed
        t0 = time.perf_counter()
        got = eng.count_staged(st, reps)
        dt = time.perf_counter() - t0
        if i == 0:
            log(f"warmup T={st.plan.time_len} reps={reps}: {dt:.2f}s count={got}")
            count = got
        else:
            assert got == count, f"count drift {got} != {count}"
            best = min(best, dt)
    log(f"T={st.plan.time_len} reps={reps}: best={best*1e3:.1f}ms over {ROUNDS} rounds")
    return best, count


def _tpu_measure(machine, data: np.ndarray, n_full: int):
    """Slope between a low-rep and a high-rep device-resident scan.

    Wide rep spread: the ~30 ms relay round-trip jitters by up to ~10 ms
    between runs, so the slope denominator must dwarf it.  Returns
    (bytes/s, single-rep count)."""
    from alfred_margaret_tpu.ops.comb_scan import make_pallas_engine

    # Factory picks the fastest eligible kernel (bitap for this needle
    # set — ops.bitap_scan); the rep spread is sized so that even at the
    # bitap rate (~600 GB/s) the slope denominator is ~100 ms of kernel.
    eng = make_pallas_engine(machine)
    r_lo, r_hi = 2, 502
    t_lo, c_lo = _time_device_scan(eng, data, r_lo)
    t_hi, c_hi = _time_device_scan(eng, data, r_hi)
    assert c_lo * r_hi == c_hi * r_lo, f"rep-count mismatch {c_lo}x{r_hi} != {c_hi}x{r_lo}"
    if t_hi > t_lo:
        value = (r_hi - r_lo) * n_full / (t_hi - t_lo)
    else:
        value = r_hi * n_full / t_hi  # overhead-dominated; report raw
        log("slope degenerate; reporting raw rate")
    return value, c_lo // r_lo


def _tpu_child() -> int:
    """Watchdog child: do the device measurement, print one parseable line."""
    from alfred_margaret_tpu.bench.dataformat import synth_corpus
    from alfred_margaret_tpu.models import ac

    n_full = N_MB * 1024 * 1024
    corpus = synth_corpus(NEEDLES, n_full, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    value, count = _tpu_measure(machine, data, n_full)
    print(f"TPU_RESULT {value} {count}", flush=True)
    return 0


def main() -> int:
    from alfred_margaret_tpu.bench.dataformat import synth_corpus
    from alfred_margaret_tpu.models import ac

    n_full = N_MB * 1024 * 1024
    corpus = synth_corpus(NEEDLES, n_full, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    log(f"corpus {N_MB} MiB + machine ready")

    # --- baseline: single-core native C++ DFA ---
    cpp_bps = None
    expected = None
    try:
        from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

        cpp = CppAcEngine(machine)
        t0 = time.perf_counter()
        cpp_count = cpp.count(data, n_threads=1)
        cpp_bps = n_full / (time.perf_counter() - t0)
        expected = cpp_count
        log(f"cpp baseline: {cpp_bps/1e9:.3f} GB/s count={cpp_count}")
    except Exception as e:  # pragma: no cover
        log(f"baseline unavailable: {e}")

    # --- TPU pallas kernel, under a watchdog subprocess -------------------
    value = None
    try:
        if os.environ.get("AM_BENCH_INPROC"):
            value, c_base = _tpu_measure(machine, data, n_full)
        else:
            import subprocess

            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-child"],
                capture_output=True,
                text=True,
                timeout=WATCHDOG_S,
            )
            sys.stderr.write(proc.stderr)
            result_lines = [
                l for l in proc.stdout.splitlines() if l.startswith("TPU_RESULT ")
            ]
            if proc.returncode != 0 or not result_lines:
                raise RuntimeError(
                    f"tpu child exited {proc.returncode}: {proc.stderr[-300:]!r}"
                )
            _, v, c = result_lines[-1].split()
            value, c_base = float(v), int(c)
        if expected is not None:
            assert c_base == expected, f"count mismatch {c_base} != {expected}"
        log(f"sustained throughput: {value/1e9:.3f} GB/s")
    except Exception as e:
        log(f"tpu path failed ({e}); falling back to cpp engine")
        if cpp_bps is None:
            raise
        t0 = time.perf_counter()
        cpp.count(data)
        value = n_full / (time.perf_counter() - t0)

    vs_baseline = (value / cpp_bps) if cpp_bps else None
    print(
        json.dumps(
            {
                "metric": "ac_count_bytes_per_sec_chip",
                "value": round(value, 1),
                "unit": "bytes/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(_tpu_child() if "--tpu-child" in sys.argv else main())
