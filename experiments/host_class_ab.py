"""Engine-level A/B: byte-class premultiplied packed host scan vs the dense
int32[S,256] path, on the BASELINE config-2 (100-needle) and config-5
(10k-needle) machines over their synthetic benchmark corpora (64 MiB).

Paired same-process runs (alternating), default thread count.  The class
path is the production auto-dispatch; the dense rows force
_class_state="unavailable".
"""
import os, sys, time
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
from alfred_margaret_tpu.bench.dataformat import synth_corpus


def best(fn, rounds=5):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)


rng = np.random.default_rng(7)
needles100 = list(dict.fromkeys(
    "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
    for _ in range(110)))[:100]
needles100[:4] = ["abc", "abcd", "bcd", "c"]
rng5 = np.random.default_rng(11)
needles10k = list(dict.fromkeys(
    "".join(chr(97 + c) for c in rng5.integers(0, 26, size=rng5.integers(5, 12)))
    for _ in range(11000)))[:10000]

for tag, needles, seed in (("config2/100n", needles100, 5), ("config5/10kn", needles10k, 13)):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 64 << 20, hit_fraction=0.01, seed=seed)
    dense = CppAcEngine(m); dense._class_state = "unavailable"
    cls = CppAcEngine(m)
    cls._CLASS_AMORTIZE = 0  # force-build: this A/B measures the scan, not the policy
    t0 = time.perf_counter(); cls._class_tables(len(corpus)); t_build = time.perf_counter() - t0
    assert cls._class_state == "ready"
    assert dense.count(corpus) == cls.count(corpus)
    n = len(corpus)
    # alternating pairs
    for rep in range(3):
        td = best(lambda: dense.count(corpus), 3)
        tc = best(lambda: cls.count(corpus), 3)
        print(f"{tag} rep{rep}: dense {n/td/1e9:.2f} GB/s | class {n/tc/1e9:.2f} GB/s | x{td/tc:.2f}")
    th_d = best(lambda: dense.matches_arrays(corpus), 2)
    th_c = best(lambda: cls.matches_arrays(corpus), 2)
    print(f"{tag} hits: dense {n/th_d/1e9:.2f} GB/s | class {n/th_c/1e9:.2f} GB/s | x{th_d/th_c:.2f}"
          f"  (classes={cls._n_classes}, table {cls._ctab.nbytes/2**20:.2f} MiB vs {dense.delta.nbytes/2**20:.1f}, build {t_build*1e3:.0f} ms)")
