"""Generate the vendored known-answer conformance artifact.

The reference cross-checks four independent implementations by comparing
their match counts on the same inputs (``/root/reference/benchmark/
benchmark.py:65-69``).  This environment has no network, so the closest
analogue is a FROZEN golden artifact whose expected results are derived
here by plain ``bytes.find`` — no shared code with any engine, not even
the NFA oracle — and checked against every engine in CI
(``tests/test_known_answer.py``).

Writes ``tests/data/golden_corpus.npz``.  Deterministic: re-running
reproduces the identical artifact (seeded RNG, fixed needle sets).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "golden_corpus.npz")


def naive_matches(needles, corpus: bytes):
    """(ends, vids) in the reference emission order — end ascending,
    longer needle first at equal ends — via bytes.find only."""
    pairs = []
    for vid, n in enumerate(needles):
        start = 0
        while True:
            i = corpus.find(n, start)
            if i < 0:
                break
            pairs.append((i + len(n), -len(n), vid))
            start = i + 1
    pairs.sort()
    ends = np.asarray([p[0] for p in pairs], dtype=np.int64)
    vids = np.asarray([p[2] for p in pairs], dtype=np.int32)
    return ends, vids


def build_sets():
    rng = np.random.default_rng(20260819)
    sets = []

    # 1. README trio over a synthetic hit-seeded corpus.
    needles = [b"tshirt", b"shirts", b"shorts"]
    frags = needles + [b"short ", b"blue ", b"zzz", b"tshir"]
    corpus = b"".join(frags[i] for i in rng.integers(0, len(frags), 30000))
    sets.append(("readme-trio", needles, corpus))

    # 2. 100 random lowercase needles (config-2 shape).
    needles = list(dict.fromkeys(
        bytes(rng.integers(97, 123, size=rng.integers(4, 9), dtype=np.uint8))
        for _ in range(110)))[:100]
    needles[:4] = [b"abc", b"abcd", b"bcd", b"c"]
    frags = needles[:20] + [bytes(rng.integers(97, 125, size=7, dtype=np.uint8)) for _ in range(30)]
    corpus = b"".join(frags[i] for i in rng.integers(0, len(frags), 18000))
    sets.append(("random-100", needles, corpus))

    # 3. Unicode byte-width mix: 2/3/4-byte sequences, suffix-overlapping
    #    needles, a NUL-containing needle, at odd byte offsets.
    uni = ["é", "𝄞", "👩‍🔬", "Привет", "ⱥ", "K"]
    needles = [u.encode() for u in uni] + [b"abc", b"bc", b"c", b"\x00ab"]
    frags = needles + [b"x", "é𝄞".encode(), b"\x00", "При".encode()]
    corpus = b"".join(frags[i] for i in rng.integers(0, len(frags), 20000))
    sets.append(("unicode-mix", needles, corpus))

    # 4. Overlap torture: periodic needles over long runs.
    needles = [b"aa", b"aaa", b"aaaa", b"ab", b"ba"]
    corpus = (b"a" * 200 + b"b" + b"ab" * 50) * 30
    sets.append(("overlap-torture", needles, corpus))
    return sets


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    payload = {}
    names = []
    for name, needles, corpus in build_sets():
        assert len(set(needles)) == len(needles), f"{name}: duplicate needles"
        ends, vids = naive_matches(needles, corpus)
        # Needles as (concatenated blob, lengths): NUL-safe framing.
        payload[f"{name}/needle_lens"] = np.asarray([len(n) for n in needles], dtype=np.int64)
        payload[f"{name}/needles"] = np.frombuffer(b"".join(needles), dtype=np.uint8)
        payload[f"{name}/corpus"] = np.frombuffer(corpus, dtype=np.uint8)
        payload[f"{name}/ends"] = ends
        payload[f"{name}/vids"] = vids
        names.append(name)
        print(f"{name}: {len(needles)} needles, {len(corpus)} bytes, {len(ends)} matches")
    payload["names"] = np.frombuffer("\n".join(names).encode(), dtype=np.uint8)
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    sys.exit(main())
