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


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the bench warmup paid ~173 s of
    relay compile in round 4; a repo-local cache makes repeat runs start
    hot.  Best-effort — unsupported backends just compile as before."""
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compile cache unavailable: {e}")


def _slope(eng, data: np.ndarray, n_full: int, peak_bps: float):
    """Slope between a low-rep and a high-rep device-resident scan.

    Wide rep spread: the ~30 ms relay round-trip jitters by up to ~10 ms
    between runs, so the slope denominator must dwarf it — sized for
    ~150 ms of kernel even at ``peak_bps`` and with a shrunken corpus.
    Returns (bytes/s, single-rep count)."""
    r_lo = 2
    r_hi = max(502, min(4002, int(0.15 * peak_bps / max(n_full, 1))))
    t_lo, c_lo = _time_device_scan(eng, data, r_lo)
    t_hi, c_hi = _time_device_scan(eng, data, r_hi)
    assert c_lo * r_hi == c_hi * r_lo, f"rep-count mismatch {c_lo}x{r_hi} != {c_hi}x{r_lo}"
    if t_hi > t_lo:
        value = (r_hi - r_lo) * n_full / (t_hi - t_lo)
    else:
        value = r_hi * n_full / t_hi  # overhead-dominated; report raw
        log("slope degenerate; reporting raw rate")
    return value, c_lo // r_lo


def _tpu_measure(machine, data: np.ndarray, n_full: int):
    """(bytes/s, single-rep count) for the production dispatch (bitap for
    this needle set — ops.bitap_scan)."""
    from alfred_margaret_tpu.ops.comb_scan import make_pallas_engine

    return _slope(make_pallas_engine(machine), data, n_full, peak_bps=600e9)


def _tpu_dense_control(machine, data: np.ndarray, n_full: int):
    """Paired dense-kernel rate on the same corpus in the same session.

    The bitap headline is load-dependent (measured 215-640 GB/s across
    sessions — experiments/tpu_bitap_ab.py); the dense kernel's
    dependent-gather floor (~165 GB/s) is the stable weather gauge, so
    emitting both lets BENCH_r*.json files be compared across rounds."""
    prior = os.environ.get("AMT_BITAP")
    os.environ["AMT_BITAP"] = "0"
    try:
        from alfred_margaret_tpu.ops.comb_scan import make_pallas_engine

        return _slope(make_pallas_engine(machine), data, n_full, peak_bps=200e9)
    finally:
        if prior is None:
            os.environ.pop("AMT_BITAP", None)
        else:
            os.environ["AMT_BITAP"] = prior


def _staging_mb_budget() -> int:
    """Corpus MiB that stages within ~100 s at the tunnel's CURRENT upload
    bandwidth (measured with one 4 MiB put).  The headline metric is a
    *slope* (sustained kernel rate), which is corpus-size-independent, so
    on slow-tunnel days a smaller resident corpus measures the same number
    instead of blowing the watchdog on staging alone."""
    import jax

    probe = np.zeros(4 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(probe))
    bw = len(probe) / max(time.perf_counter() - t0, 1e-9)  # bytes/s
    budget = int(bw * 100 / (1 << 20))  # MiB stagable in ~100 s
    mb = max(16, min(N_MB, budget))
    log(f"staging probe: {bw/1e6:.1f} MB/s upload -> corpus {mb} MiB")
    return mb


def _tpu_child() -> int:
    """Watchdog child: do the device measurement, print one parseable line.

    Parity is checked HERE against the native C++ DFA on the same corpus
    (the parent's corpus may be larger when the staging probe shrinks
    ours, so its count is not comparable); a missing native toolchain
    downgrades the check to a warning instead of failing the benchmark."""
    from alfred_margaret_tpu.bench.dataformat import synth_corpus
    from alfred_margaret_tpu.models import ac

    _enable_compile_cache()
    mb = _staging_mb_budget()
    n_eff = mb * 1024 * 1024
    corpus = synth_corpus(NEEDLES, n_eff, hit_fraction=0.01, seed=3)
    data = np.frombuffer(corpus, dtype=np.uint8)
    machine = ac.build([(n, i) for i, n in enumerate(NEEDLES)])
    value, count = _tpu_measure(machine, data, n_eff)
    try:
        from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

        expected = CppAcEngine(machine).count(data)
    except Exception as e:  # NativeUnavailable: no compiler on this host
        log(f"WARNING native parity check skipped ({e})")
        expected = count
    if count != expected:
        log(f"PARITY MISMATCH device {count} != cpp {expected}")
        return 1
    try:
        dense_value, dense_count = _tpu_dense_control(machine, data, n_eff)
        if dense_count != count:
            log(f"PARITY MISMATCH dense control {dense_count} != {count}")
            return 1
    except Exception as e:  # pragma: no cover - control is best-effort
        log(f"dense control unavailable: {e}")
        dense_value = 0.0
    print(f"TPU_RESULT {value} {count} {dense_value}", flush=True)
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
    dense_value = None
    try:
        if os.environ.get("AM_BENCH_INPROC"):
            _enable_compile_cache()
            value, c_base = _tpu_measure(machine, data, n_full)
            try:
                dense_value, _ = _tpu_dense_control(machine, data, n_full)
            except Exception as e:
                log(f"dense control unavailable: {e}")
        else:
            import subprocess

            retries = int(os.environ.get("AM_BENCH_RETRIES", "2"))
            proc = None
            for attempt in range(retries + 1):
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__), "--tpu-child"],
                        capture_output=True,
                        text=True,
                        timeout=WATCHDOG_S,
                    )
                    break
                except subprocess.TimeoutExpired as te:
                    # The relay flaps: a wedged child usually means the
                    # device connection died mid-run; a fresh child often
                    # succeeds.  Log the child's partial stderr for
                    # diagnosis before retrying.
                    tail = te.stderr or b""
                    if isinstance(tail, bytes):
                        tail = tail.decode(errors="replace")
                    tail = tail[-400:]
                    log(f"tpu child timed out (attempt {attempt + 1}/"
                        f"{retries + 1}); child stderr tail: {tail!r}")
                    if attempt == retries:
                        raise
            sys.stderr.write(proc.stderr)
            result_lines = [
                l for l in proc.stdout.splitlines() if l.startswith("TPU_RESULT ")
            ]
            if proc.returncode != 0 or not result_lines:
                raise RuntimeError(
                    f"tpu child exited {proc.returncode}: {proc.stderr[-300:]!r}"
                )
            parts = result_lines[-1].split()
            value, c_base = float(parts[1]), int(parts[2])
            dense_value = float(parts[3]) if len(parts) > 3 else None
            if dense_value is not None and dense_value <= 0:
                dense_value = None
            expected = None  # child checked parity on ITS (possibly smaller) corpus
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
    if dense_value:
        log(f"dense control: {dense_value/1e9:.3f} GB/s "
            f"(headline/dense = {value/dense_value:.2f}x)")
    out = {
        "metric": "ac_count_bytes_per_sec_chip",
        "value": round(value, 1),
        "unit": "bytes/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }
    if dense_value:
        # Weather gauge: the dense kernel's dependent-gather floor is
        # load-stable (~165 GB/s); the bitap headline varies 215-640 GB/s
        # with chip load.  Carrying both makes rounds comparable.
        out["dense_control_bytes_per_sec"] = round(dense_value, 1)
        out["headline_vs_dense"] = round(value / dense_value, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(_tpu_child() if "--tpu-child" in sys.argv else main())
