"""Mid-tier (multi-row) kernel: does unroll=2 (the compile-time guard for
rows > 16) leave 3-5x on the table vs unroll 4/8?  rows=24 packing=2
machine ~= one needle group of the 100-needle BASELINE config."""
import sys, os, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.bench.dataformat import synth_corpus

rng = np.random.default_rng(7)
needles = list(
    dict.fromkeys(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
        for _ in range(110)
    )
)[:34]
machine = ac.build([(n, i) for i, n in enumerate(needles)])
corpus = synth_corpus(needles, 64 << 20, hit_fraction=0.01, seed=5)
data = np.frombuffer(corpus, dtype=np.uint8)

expected = None
for unroll in [int(x) for x in (sys.argv[1:] or [2, 4, 8])]:
    eng = PallasAcEngine(machine, unroll=unroll)
    print(f"unroll={unroll}: rows={eng.comp.rows} packing={eng.comp.packing}", flush=True)
    st = eng.stage(data)
    t0 = time.perf_counter()
    c = eng.count_staged(st)
    print(f"  compile+first: {time.perf_counter()-t0:.0f}s count={c}", flush=True)
    if expected is None:
        expected = c
    assert c == expected, (c, expected)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        eng.count_staged(st)
        best = min(best, time.perf_counter() - t0)
    print(f"  unroll={unroll}: {len(data)/best/1e9:.2f} GB/s ({best*1e3:.0f} ms)", flush=True)
