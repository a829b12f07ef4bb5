"""Bitap (shift-AND) engine: parity, eligibility, and layout tests.

The bitap kernel is a *different algorithm* from the DFA engines (register
automaton, one bit track per needle), so parity here is cross-algorithm
conformance, same spirit as the reference's multi-implementation benchmark
count checks (``benchmark/benchmark.py:65-69``).
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine, plan_bitap
from alfred_margaret_tpu.ops.comb_scan import make_pallas_engine
from alfred_margaret_tpu.bench.dataformat import synth_corpus


def _eng(machine, **kw):
    kw.setdefault("n_streams", 256)
    kw.setdefault("t_tile", 32)
    kw.setdefault("interpret", True)
    return BitapAcEngine(machine, **kw)


def _check(needles, corpus: bytes):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    data = np.frombuffer(corpus, dtype=np.uint8)
    exp = ac.count_matches(m, corpus)
    st = eng.stage(data)
    assert eng.count_staged(st) == exp
    assert eng.contains_staged(st) == (exp > 0)
    return eng, st, exp


def test_headline_needles():
    needles = ["tshirt", "shirts", "shorts"]
    corpus = synth_corpus(needles, 1 << 15, hit_fraction=0.05, seed=1)
    eng, st, exp = _check(needles, corpus)
    assert exp > 0
    # reps grid: counts scale exactly
    assert eng.count_staged(st, reps=3) == 3 * exp


def test_suffix_and_overlap_needles():
    # "b" is a suffix of "ab"; "abc" extends both: all tracks fire
    # independently, matching the reference's flattened output sets.
    _check(["ab", "b", "abc", "zz"], b"zabcabzzzb" * 300)


def test_duplicate_needles_multiplicity():
    needles = ["x", "x", "yy", "x"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    lay = plan_bitap(m)
    assert lay is not None and lay.n_words == 1
    # one track for "x" with weight 3
    weights = sorted(w for _, _, w in lay.words[0].fields)
    assert weights == [1, 3]
    _check(needles, b"xyxyyxx" * 200)


def test_non_ascii_needles_no_fold():
    m = ac.build([("café", 0), ("écl", 1)])
    lay = plan_bitap(m)
    assert lay is not None and not lay.words[0].fold
    _check(["café", "écl"], "un café éclair café".encode() * 100)


def test_single_byte_and_max_track():
    _check(["a"], b"banana" * 500)
    nd30 = "abcdefghijklmnopqrstuvwxyz1234"
    lay = plan_bitap(ac.build([(nd30, 0)]))
    assert lay is not None and lay.unroll == 1  # 1-bit final headroom
    _check([nd30], (nd30 + "pad").encode() * 40)


def test_multiword_layouts():
    # 31-90 track bytes: needles bin-pack into 2-3 int32 registers.
    rng = np.random.default_rng(11)
    needles = [
        "".join(rng.choice(list("abcdef"), size=int(rng.integers(3, 9))))
        for _ in range(12)
    ]
    needles = list(dict.fromkeys(needles))
    total = sum(len(n) for n in needles)
    assert total > 30, total
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    lay = plan_bitap(m)
    assert lay is not None and 2 <= lay.n_words <= 3
    # every needle has exactly one track somewhere
    n_fields = sum(len(w.fields) for w in lay.words)
    assert n_fields == len(needles)
    corpus = synth_corpus(needles, 1 << 15, hit_fraction=0.08, seed=4)
    eng, st, exp = _check(needles, corpus)
    assert exp > 0
    assert eng.count_staged(st, reps=2) == 2 * exp


def test_multiword_fuzz():
    rng = np.random.default_rng(77)
    alphabet = "abAB12"
    for trial in range(12):
        needles = list(
            dict.fromkeys(
                "".join(rng.choice(list(alphabet), size=int(rng.integers(1, 8))))
                for _ in range(int(rng.integers(7, 20)))
            )
        )
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = plan_bitap(m)
        if lay is None:  # > 90 track bits
            continue
        frags = needles + ["ab", "1", "BBA"]
        hay = "".join(
            frags[i]
            for i in rng.integers(0, len(frags), size=int(rng.integers(30, 400)))
        ).encode()
        eng = _eng(m)
        st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
        exp = ac.count_matches(m, hay)
        assert eng.count_staged(st) == exp, (trial, needles, lay.n_words)
        assert eng.contains_staged(st) == (exp > 0)


def test_binary_corpus():
    rng = np.random.default_rng(7)
    blob = rng.integers(0, 256, size=20000).astype(np.uint8)
    needles = ["ab", "ba", "\x01\x02"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    exp = ac.count_matches(m, blob.tobytes())
    assert eng.count_staged(eng.stage(blob)) == exp


def test_matches_crossing_stream_boundaries():
    # A corpus that is exactly needles end to end: every stream boundary
    # splits a needle, exercising the warm-up overlap accounting.
    needles = ["tshirt", "shirts", "shorts"]
    corpus = b"tshirtshirtsshorts" * 700
    _check(needles, corpus)


def test_eligibility_gates():
    assert plan_bitap(ac.build([("", 0), ("a", 1)])) is None  # empty needle
    assert plan_bitap(ac.build([("a\x00b", 0)])) is None  # NUL byte
    assert plan_bitap(ac.build([("x" * 31, 0)])) is None  # track too long
    assert plan_bitap(ac.build([("abcdefgh", i) for i in range(5)])) is not None
    # composed CI machines must never take the byte-literal bitap path
    from alfred_margaret_tpu.models import case_dfa

    if case_dfa.eligible([b"kelvin"]):
        cm = case_dfa.compose_build([(b"kelvin", 0)])
        assert plan_bitap(cm) is None


def test_factory_prefers_bitap(monkeypatch):
    m = ac.build([("tshirt", 0), ("shirts", 1), ("shorts", 2)])
    eng = make_pallas_engine(m, interpret=True, n_streams=256, t_tile=32)
    assert isinstance(eng, BitapAcEngine)
    monkeypatch.setenv("AMT_BITAP", "0")
    eng2 = make_pallas_engine(m, interpret=True, n_streams=256, t_tile=32)
    assert not isinstance(eng2, BitapAcEngine)


def test_adopt_staged_cross_engine():
    # Stage with the dense engine, adopt + scan with bitap (layout is
    # machine-independent) — the serving needle-swap path.
    needles = ["tshirt", "shirts", "shorts"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    monkey_dense = make_pallas_engine(
        ac.build([("shirtss", 0)]), interpret=True, n_streams=256, t_tile=32
    )
    corpus = synth_corpus(needles, 1 << 14, hit_fraction=0.05, seed=2)
    data = np.frombuffer(corpus, dtype=np.uint8)
    st = monkey_dense.stage(data)
    eng = _eng(m)
    adopted = eng.adopt_staged(st)
    assert adopted is not None
    assert eng.count_staged(adopted) == ac.count_matches(m, corpus)


def test_inherited_extraction_agrees():
    # matches_arrays goes through the inherited dense states kernel; the
    # composition bitap-count + dense-extraction over one handle must agree.
    needles = ["ab", "b", "abc"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    corpus = b"zabcab" * 400
    data = np.frombuffer(corpus, dtype=np.uint8)
    st = eng.stage(data)
    ends, vids = eng.matches_arrays_staged(st)
    oracle = ac.all_matches(m, corpus)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
    )
    assert eng.count_staged(st) == len(oracle)


def test_bits_extraction_parity():
    # The bitmap extraction path runs the bitap step (override of
    # _bits_tables); positions + re-derived states must match the oracle.
    for needles, hay in [
        (["ab", "b", "abc"], b"zabcab" * 400),
        (["x", "x", "yy"], b"xyxyyxx" * 300),
    ]:
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = _eng(m)
        st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
        got = eng.match_positions_staged_bits(st)
        assert got is not None, "bits path did not engage"
        ends, vids = eng.matches_arrays_staged(st)
        oracle = ac.all_matches(m, hay)
        assert len(ends) == len(oracle)
        assert all(
            int(e) == o.pos and int(v) == o.value
            for e, v, o in zip(ends, vids, oracle)
        )


def test_needle_presence():
    needles = ["tshirt", "shirts", "shorts", "tshirt"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    data = np.frombuffer(b"xx tshirt yy" * 50, dtype=np.uint8)
    pres = eng.needle_presence_staged(eng.stage(data))
    assert pres.tolist() == [True, False, False, True]


def test_value_presence_via_needle_bits(monkeypatch):
    # MatchEngine.value_presence takes the ONE-sticky-scan path for
    # single-word bitap engines (containsAll feeds off this).
    from alfred_margaret_tpu.engine import MatchEngine
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    needles = ["tshirt", "shirts", "shorts", "tshirt"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    me = MatchEngine(m)
    eng = _eng(m)
    monkeypatch.setattr(me, "_pallas_engine", lambda: eng)
    monkeypatch.setattr(me, "_pick", lambda n, staged=False: "pallas")
    pres = me.value_presence(b"xx tshirt yy shorts" * 10, CASE_SENSITIVE)
    assert list(pres) == [True, False, True, True]


def test_streaming_over_bitap():
    # Out-of-core chunked scanning composes with the bitap engine (chunk
    # boundaries + cold-prefix replay subtraction over bitap count_staged).
    from alfred_margaret_tpu.ops.streaming import StreamingScanner

    needles = ["tshirt", "shirts", "shorts"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    corpus = b"tshirtshirtsshorts xx " * 900
    sc = StreamingScanner(eng, m, chunk_bytes=4096)
    data = np.frombuffer(corpus, dtype=np.uint8)
    assert sc.count(data) == ac.count_matches(m, corpus)


def test_host_bitap_oracle():
    # The C++ register-automaton implementation (native.cpp_engine
    # .CppBitapEngine): independent of the DFA tables AND of the Pallas
    # kernels; counts must agree on every corner the device engine covers.
    pytest.importorskip("ctypes")
    from alfred_margaret_tpu.native.build import NativeUnavailable

    try:
        from alfred_margaret_tpu.native.cpp_engine import (
            CppBitapEngine,
            plan_host_bitap,
        )

        cases = [
            (["ab", "b", "abc", "ab"], b"zabcabzb" * 3000),  # dup + suffix
            (["a\x00b"], b"xa\x00ba\x00b" * 2000),  # NUL ok on host
            (["tshirt", "shirts", "shorts"], b"tshirtshirtsshorts" * 500),
        ]
        for needles, hay in cases:
            m = ac.build([(n, i) for i, n in enumerate(needles)])
            assert plan_host_bitap(m) is not None
            eng = CppBitapEngine(m)
            exp = ac.count_matches(m, hay)
            assert eng.count(np.frombuffer(hay, dtype=np.uint8)) == exp
            assert eng.contains(hay) == (exp > 0)
        # 65 track bits -> ineligible
        assert plan_host_bitap(ac.build([("x" * 65, 0)])) is None
        assert plan_host_bitap(ac.build([("x" * 64, 0)])) is not None
    except NativeUnavailable:
        pytest.skip("no native toolchain")


def test_fuzz_vs_host_oracle():
    rng = np.random.default_rng(42)
    alphabet = "abAB12"
    for trial in range(25):
        n_needles = int(rng.integers(1, 6))
        needles = []
        for _ in range(n_needles):
            L = int(rng.integers(1, 6))
            needles.append("".join(rng.choice(list(alphabet), size=L)))
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        lay = plan_bitap(m)
        assert lay is not None, needles
        frags = needles + ["ab", "1", "BBA"]
        hay = "".join(
            frags[i] for i in rng.integers(0, len(frags), size=int(rng.integers(10, 300)))
        ).encode()
        eng = _eng(m)
        st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
        exp = ac.count_matches(m, hay)
        got = eng.count_staged(st)
        assert got == exp, (trial, needles, got, exp)
        assert eng.contains_staged(st) == (exp > 0)


def test_needle_presence_multiword():
    # 12 needles across 2-3 words: per-word sticky planes keep flags from
    # aliasing across words that share bit positions.
    rng = np.random.default_rng(11)
    needles = list(
        dict.fromkeys(
            "".join(rng.choice(list("abcdef"), size=int(rng.integers(3, 9))))
            for _ in range(12)
        )
    )
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = _eng(m)
    assert eng.bitap.n_words >= 2
    hay = (" ".join(needles[::2]) + " zzz ").encode() * 30
    st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
    pres = eng.needle_presence_staged(st)
    assert list(pres) == [n.encode() in hay for n in needles]
