"""End-to-end serving walkthrough — runnable on CPU or a TPU host.

Demonstrates the production patterns from docs/SERVING.md over one
resident corpus: build -> stage once -> repeated device-resident scans ->
live needle-set swap (adopt_staged) -> IgnoreCase via the composed case
DFA -> priority replacement -> a (virtual) device mesh. Every step
asserts exactness against the scalar oracle, so this file is also an
acceptance script:

    python examples/serving_demo.py          # uses TPU when present
    JAX_PLATFORMS=cpu python examples/serving_demo.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from alfred_margaret_tpu import (
    CASE_SENSITIVE,
    IGNORE_CASE,
    Replacer,
    Searcher,
    Splitter,
)
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.models import ac

MB = 1 << 20


def step(msg, t0):
    print(f"  [{time.perf_counter() - t0:6.2f}s] {msg}", flush=True)


def main():
    t0 = time.perf_counter()
    needles = ["tshirt", "shirts", "shorts", "hoodie"]
    corpus = synth_corpus(needles[:3], 8 * MB, hit_fraction=0.01, seed=42)
    oracle = ac.build([(n, i) for i, n in enumerate(needles)])
    expected = ac.count_matches(oracle, corpus)

    # 1. Build + stage once, scan many times.
    s = Searcher.build_needle_id_searcher(CASE_SENSITIVE, needles)
    staged = s.stage(corpus)
    for _ in range(3):
        assert s.count_matches(staged) == expected
    step(f"staged scans: {expected} matches x3, exact", t0)

    # 2. Live needle-set swap: the corpus stays resident.
    s2 = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["short", "tshir"])
    staged2 = s2.adopt_staged(staged)
    expected2 = s2.count_matches(bytes(corpus))
    assert s2.count_matches(staged2) == expected2
    step(f"needle-set swap via adopt_staged: {expected2} matches, exact", t0)

    # 3. IgnoreCase on raw bytes (composed case DFA).  Reference contract:
    # the caller passes LOWERCASE needles under IgnoreCase
    # (Searcher.hs:108-110); STRASSE does not match straße (simple
    # per-code-point lowering, not full case folding — ß stays ß).
    s_ci = Searcher.build_needle_id_searcher(IGNORE_CASE, ["tshirt", "straße"])
    hay_ci = "TSHIRT tshirt STRASSE straße İ " * 1000
    got_ci = s_ci.count_matches(hay_ci)
    assert got_ci == 3000, got_ci  # 2x tshirt + 1x straße per repeat
    step(f"IgnoreCase composed scan: {got_ci} matches, raw coordinates", t0)

    # 4. Priority replacement (bit-exact multi-pass semantics).
    r = Replacer.build(CASE_SENSITIVE, [("tshirt", "TEE"), ("shirts", "S")])
    out = r.run("tshirts and shirts")
    assert out == "TEEs and S", out
    step(f"replacer: {out!r}", t0)

    # 5. Splitting.
    frags = Splitter.build(", ").split("a, b, c")
    assert frags == ["a", "b", "c"]
    step(f"splitter: {frags}", t0)

    # 5b. Round-5 serving patterns: staged replacement (one resident
    # corpus feeds search AND replace) and screened containsAny (a
    # fire-free corpus answers from the stride-2 filter alone; candidate
    # fires fall back to the exact scan — verdicts exact either way).
    rep_pairs = [("tshirt", "TEE"), ("shirts", "S")]
    r5 = Replacer.build(CASE_SENSITIVE, rep_pairs)
    corpus_b = "tshirts and shirts " * 2000
    staged_r = r5.searcher.stage(corpus_b)
    assert r5.run(staged_r) == r5.run(corpus_b).encode()  # staged in, bytes out
    step("staged replacer: bit-exact against the bytes path", t0)
    screen_corpus = "0123456789 ,;:! " * 20000  # alphabet-disjoint
    many = ["needle%02da" % i for i in range(40)]  # mid-tier: comb16 + filter
    s_mid = Searcher.build(CASE_SENSITIVE, many)
    assert s_mid.contains_any(s_mid.stage(screen_corpus)) is False
    assert s_mid.contains_any(screen_corpus[:500] + many[3] + screen_corpus[500:])
    step("screened containsAny: fire-free corpus answered by the filter alone", t0)

    # 6. Device mesh (virtual on CPU; real chips on a TPU slice).
    import jax

    n_dev = len(jax.devices())
    if n_dev >= 2:
        from alfred_margaret_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices()[: min(4, n_dev)], data=min(4, n_dev))
        dist = s.distributed(mesh)
        assert dist.count(corpus) == expected
        step(f"mesh count over {mesh.devices.size} devices: exact", t0)
    else:
        step("mesh step skipped (single device)", t0)

    print("serving demo: ALL STEPS EXACT")


if __name__ == "__main__":
    main()
