"""Dump real config-2 and config-5 machines + corpora for the host packed-count probe.

Writes /tmp/amprobe/{c2,c5}_{delta,mcount}.i32 and corpus bytes.
"""
import os
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus

out = "/tmp/amprobe"
os.makedirs(out, exist_ok=True)

rng = np.random.default_rng(7)
needles100 = list(dict.fromkeys(
    "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
    for _ in range(110)))[:100]
needles100[:4] = ["abc", "abcd", "bcd", "c"]

rng5 = np.random.default_rng(11)
needles10k = list(dict.fromkeys(
    "".join(chr(97 + c) for c in rng5.integers(0, 26, size=rng5.integers(5, 12)))
    for _ in range(11000)))[:10000]

for tag, needles, mb, seed in (("c2", needles100, 64, 5), ("c5", needles10k, 64, 13)):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    delta = np.ascontiguousarray(m.delta, dtype=np.int32)  # [S,256]
    S = delta.shape[0]
    mcount = np.ascontiguousarray(m.match_count, dtype=np.int32)
    corpus = np.frombuffer(synth_corpus(needles, mb << 20, hit_fraction=0.01, seed=seed), dtype=np.uint8)
    delta.tofile(f"{out}/{tag}_delta.i32")
    mcount.tofile(f"{out}/{tag}_mcount.i32")
    corpus.tofile(f"{out}/{tag}_corpus.u8")
    print(tag, "states", S, "max_count", int(mcount.max()), "table_MB", round(delta.nbytes/2**20, 2))

# --- byte-class-compressed tables (device models/byteclass.py trick, host-side) ---
for tag in ("c2", "c5"):
    delta = np.fromfile(f"{out}/{tag}_delta.i32", dtype=np.int32).reshape(-1, 256)
    mcount = np.fromfile(f"{out}/{tag}_mcount.i32", dtype=np.int32)
    # Equivalence classes of byte columns: two bytes are in one class iff
    # every state transitions identically on them.
    uniq, inv = np.unique(delta.T, axis=0, return_inverse=True)
    C = uniq.shape[0]
    cls = inv.astype(np.int32)            # [256] byte -> class
    dc = np.ascontiguousarray(uniq.T)      # [S, C]
    packed = (dc * np.int64(C) + (mcount[dc].astype(np.int64) << 24)).astype(np.int32)
    # packed entry = next_state*C | count<<24 : next gather index base is
    # entry&0xFFFFFF (premultiplied), count rides the high byte.
    assert delta.shape[0] * C < (1 << 24), (tag, delta.shape[0], C)
    cls.tofile(f"{out}/{tag}_cls.i32")
    np.ascontiguousarray(packed).tofile(f"{out}/{tag}_pclass.i32")
    print(tag, "classes", C, "class_table_MB", round(packed.nbytes / 2**20, 3))
