"""Out-of-core streaming scan on hardware: VERDICT r1 item 4 acceptance.

Streams a disk-resident (np.memmap) corpus much larger than any single
staged transfer through StreamingScanner on the device engine in fixed
64 MiB chunks — constant device memory — and checks the count against the
host C++ engine.  Reports end-to-end wall throughput (transfer-bound on
this relay: the staging tunnel runs ~60 MB/s, so this validates exactness
and memory discipline, not kernel speed — the kernel rate is measured
separately by the staged-slope scripts).

Usage: python tpu_streaming_check.py [total_mib] [chunk_mib]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The axon plugin ignores the JAX_PLATFORMS env var; the config API works.
# Without this, CPU smoke runs (AMT_SSC_INTERPRET=1) hang in backend init
# whenever the relay is down.
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.native import cpp_engine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.ops.streaming import StreamingScanner
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def main():
    total_mib = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunk_mib = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.default_rng(7)
    needles100 = list(dict.fromkeys(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
        for _ in range(110)))[:100]
    needles100[:4] = ["abc", "abcd", "bcd", "c"]
    cases = [
        ("config-1 dense", ["tshirt", "shirts", "shorts"], PallasAcEngine),
        ("config-2 comb16", needles100, Comb16PallasAcEngine),
    ]
    path = "/tmp/stream_corpus.bin"
    for label, needles, Eng in cases:
        machine = ac.build([(n, i) for i, n in enumerate(needles)])
        # Build the corpus on disk chunk-by-chunk (the host must not need
        # the whole thing resident either).
        n_total = total_mib * MB
        mm = np.memmap(path, dtype=np.uint8, mode="w+", shape=(n_total,))
        for a in range(0, n_total, 128 * MB):
            b = min(n_total, a + 128 * MB)
            mm[a:b] = np.frombuffer(
                synth_corpus(needles, b - a, hit_fraction=0.01, seed=11 + a),
                dtype=np.uint8,
            )
        mm.flush()
        ro = np.memmap(path, dtype=np.uint8, mode="r", shape=(n_total,))

        t0 = time.perf_counter()
        expected = cpp_engine.CppAcEngine(machine).count(np.asarray(ro))
        t_host = time.perf_counter() - t0
        print(f"[{label}] host count={expected} ({n_total/t_host/1e9:.2f} GB/s)",
              flush=True)

        interp = bool(os.environ.get("AMT_SSC_INTERPRET"))  # CPU smoke mode
        eng = Eng(machine, interpret=interp)
        sc = StreamingScanner(eng, machine, chunk_bytes=chunk_mib * MB)
        t0 = time.perf_counter()
        got = sc.count(ro)
        dt = time.perf_counter() - t0
        assert got == expected, f"{label}: streamed {got} != host {expected}"
        print(f"[{label}] streamed {total_mib} MiB in {chunk_mib} MiB chunks: "
              f"count OK, {n_total/dt/1e6:.0f} MB/s end-to-end", flush=True)
    os.unlink(path)


if __name__ == "__main__":
    main()
