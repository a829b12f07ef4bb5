"""Hardware check: cross-searcher staged-corpus adoption skips the upload.

Stages a corpus once, swaps in a second searcher via
``Searcher.adopt_staged``, and compares the adopted searcher's first-scan
wall time against a fresh ``stage`` (which re-pays the ~60 MB/s tunnel
transfer).  Counts are asserted exact against the host C++ engine.

Usage: python experiments/tpu_adopt_check.py [size_mib]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.searcher import Searcher
from alfred_margaret_tpu.utils.case import CASE_SENSITIVE
from alfred_margaret_tpu.bench.dataformat import synth_corpus

MB = 1 << 20


def main():
    size = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * MB
    needles_a = ["tshirt", "shirts", "shorts"]
    needles_b = ["short", "hoodie", "tshir"]  # different set, shorter needles
    corpus = synth_corpus(needles_a, size, hit_fraction=0.01, seed=3)

    s_a = Searcher.build_needle_id_searcher(CASE_SENSITIVE, needles_a)
    s_b = Searcher.build_needle_id_searcher(CASE_SENSITIVE, needles_b)
    exp_a = Searcher.build_needle_id_searcher(
        CASE_SENSITIVE, needles_a, engine="cpp"
    ).count_matches(corpus)
    exp_b = Searcher.build_needle_id_searcher(
        CASE_SENSITIVE, needles_b, engine="cpp"
    ).count_matches(corpus)

    t0 = time.perf_counter()
    st_a = s_a.stage(corpus)
    got_a = s_a.count_matches(st_a)  # forces compile + first scan
    t_first = time.perf_counter() - t0
    assert got_a == exp_a, (got_a, exp_a)
    print(f"stage+first scan (searcher A):   {t_first*1e3:8.1f} ms "
          f"(incl. kernel compile)", flush=True)

    # Warm searcher B's count fn once so BOTH timed paths below are pure
    # of trace/lower/compile cost (the swap's delta is the upload, not the
    # per-searcher compile, which any path pays exactly once).
    warm = s_b.adopt_staged(st_a)
    assert s_b.count_matches(warm) == exp_b

    t0 = time.perf_counter()
    st_b = s_b.adopt_staged(st_a)
    got_b = s_b.count_matches(st_b)
    t_adopt = time.perf_counter() - t0
    assert got_b == exp_b, (got_b, exp_b)
    reused = st_b.device is st_a.device
    print(f"adopt+scan (needle-set swap):    {t_adopt*1e3:8.1f} ms  "
          f"(device streams reused: {reused})", flush=True)

    t0 = time.perf_counter()
    st_b2 = s_b.stage(corpus)
    got_b2 = s_b.count_matches(st_b2)
    t_restage = time.perf_counter() - t0
    assert got_b2 == exp_b
    print(f"fresh stage+scan (re-upload):    {t_restage*1e3:8.1f} ms", flush=True)
    print(f"adoption saves {(t_restage - t_adopt)*1e3:.0f} ms per needle-set "
          f"swap ({size/MB:.0f} MiB corpus)", flush=True)
    assert reused, "expected device-stream reuse for the shorter needle set"


if __name__ == "__main__":
    main()
