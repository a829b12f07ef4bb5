"""Native C++ engine parity tests (skipped if no toolchain)."""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.xla_scan import extract_matches

try:
    from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

    _eng = CppAcEngine(ac.build([(b"x", 0)]))
    NATIVE = True
except Exception:
    NATIVE = False

pytestmark = pytest.mark.skipif(not NATIVE, reason="native toolchain unavailable")


def test_parity_with_oracle():
    rng = np.random.default_rng(11)
    for _ in range(5):
        needles = [bytes(rng.choice(list(b"abcAB"), size=rng.integers(1, 5))) for _ in range(6)]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = CppAcEngine(m)
        hay = bytes(rng.choice(list(b"abcAB"), size=20000))
        oracle = ac.all_matches(m, hay)
        assert eng.count(hay) == len(oracle)
        states = eng.final_states(hay)
        pos, vids = extract_matches(m, states)
        assert list(pos) == [mm.pos for mm in oracle]


def test_multithreaded_matches_single():
    rng = np.random.default_rng(12)
    m = ac.build([(b"ab", 0), (b"ba", 1), (b"aab", 2)])
    eng = CppAcEngine(m)
    hay = bytes(rng.choice(list(b"ab"), size=500_000))
    c1 = eng.count(hay, n_threads=1)
    for nt in (2, 4, 8):
        assert eng.count(hay, n_threads=nt) == c1
    s1 = eng.final_states(hay, n_threads=1)
    s8 = eng.final_states(hay, n_threads=8)
    assert np.array_equal(s1, s8)


def test_empty():
    m = ac.build([(b"x", 0)])
    eng = CppAcEngine(m)
    assert eng.count(b"") == 0


def test_lower_bytes_only_parity():
    """Metadata-free transducer produces byte-identical lowered streams."""
    from alfred_margaret_tpu.utils import utf8

    rng = np.random.default_rng(4)
    cases = [
        "İstanbul STRASSE straße Ⱥx ǄǱ θΩ K Å".encode(),
        b"plain ASCII with UPPER and lower 0123",
        bytes(rng.integers(0, 256, size=4096, dtype=np.uint8).tolist()),  # malformed soup
        "𝄞💩".encode() * 100 + b"\xc3" + b"tail",
        b"",
    ]
    for raw in cases:
        full = utf8.lower_transform(raw, need_coords=True)
        fast = utf8.lower_transform(raw, need_coords=False)
        assert bytes(fast.lowered) == bytes(full.lowered), raw[:20]


def test_hits_scan_parity():
    """am_scan_hits_mt == extract_matches(final_states) on fuzz inputs,
    single- and multi-threaded, incl. the cap-retry path."""
    from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
    from alfred_margaret_tpu.ops.xla_scan import extract_matches

    rng = np.random.default_rng(9)
    needles = [bytes(rng.choice(list(b"abc"), size=rng.integers(1, 4))) for _ in range(6)]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = CppAcEngine(m)
    hay = bytes(rng.choice(list(b"abcz"), size=200_000))
    want = extract_matches(m, eng.final_states(hay))
    for nt in (1, 4):
        got = eng.matches_arrays(hay, n_threads=nt)
        assert np.array_equal(got[0], want[0]) and np.array_equal(got[1], want[1])
    assert eng.matches_arrays(b"")[0].shape == (0,)


def test_first_hit_and_value_presence():
    """Native early-exit scans: first_hit (containsAny Done True) and
    value_presence (containsAll unseen-set) must be exact."""
    import numpy as np
    import pytest

    from alfred_margaret_tpu.models import ac

    try:
        from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

        m = ac.build([(b"ab", 0), (b"bc", 1), (b"zz", 2)])
        eng = CppAcEngine(m)
    except Exception:
        pytest.skip("native library unavailable")
    data = np.frombuffer(b"xxabcxx" + b"y" * 100000 + b"zz", dtype=np.uint8)
    assert eng.first_hit(data) > 0  # existence witness (any hit)
    # Single-threaded-sized input: deterministic leftmost position.
    assert eng.first_hit(np.frombuffer(b"xxabcxx", dtype=np.uint8)) == 4
    assert eng.first_hit(np.frombuffer(b"yyy", dtype=np.uint8)) == -1
    pres = eng.value_presence(data, 3)
    assert pres.tolist() == [True, True, True]
    pres2 = eng.value_presence(np.frombuffer(b"xxabcxx", dtype=np.uint8), 3)
    assert pres2.tolist() == [True, True, False]


def test_host_ci_bitap_oracle():
    # Host byte-class bitap over a composed case-folding DFA: third
    # independent algorithm for CI conformance (scalar oracle / composed
    # DFA / register automaton), incl. the Kelvin-K trap fallback.
    from alfred_margaret_tpu.models import ac, case_dfa
    from alfred_margaret_tpu.native.build import NativeUnavailable
    from alfred_margaret_tpu.utils import utf8
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    try:
        from alfred_margaret_tpu.native.cpp_engine import (
            CppBitapEngine,
            plan_host_bitap_ci,
        )

        low = [utf8.lower_str(n) for n in ["Kilo", "dress", "kilo"]]
        m = ac.build([(n, i) for i, n in enumerate(low)])
        cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
        assert plan_host_bitap_ci(cm) is not None
        e = CppBitapEngine(cm)
        assert e.trap is not None  # 'i'/'k' letters
        data = ("KILO dress kIlO DRESS xx " * 300).encode()
        assert e.count(data) == ac.count_matches(m, data, IGNORE_CASE)
        assert e.contains(data)
        # Kelvin sign: track misses, trap fires, DFA fallback exact.
        kelvin = ("\u212aILO dress " * 50).encode()
        assert e._trap_fires(np.frombuffer(kelvin, dtype=np.uint8))
        assert e.count(kelvin) == ac.count_matches(m, kelvin, IGNORE_CASE)
        assert e.contains(kelvin)
        assert not e.contains(b"zzz qq")
        # CS machines keep refusing the CI planner and vice versa
        assert plan_host_bitap_ci(m) is None
    except NativeUnavailable:
        pytest.skip("no C++ toolchain")


def _force_class(machine):
    """Engine with the byte-class packed path force-enabled (policy off)."""
    e = CppAcEngine(machine)
    e._CLASS_AMORTIZE = 0
    e._CLASS_USE_MIN = 1
    return e


def test_class_packed_count_and_hits_parity():
    """Byte-class premultiplied packed scan == dense scan, bit for bit
    (count, and (pos, value) streams), across overlapping-needle machines,
    multi-thread counts, and a composed-CI machine."""
    rng = np.random.default_rng(21)
    needles = [bytes(rng.choice(list(b"abcde"), size=rng.integers(1, 6))) for _ in range(12)]
    needles += [b"abc", b"abcd", b"bcd", b"c"]
    m = ac.build([(n, i) for i, n in enumerate(dict.fromkeys(needles))])
    dense = CppAcEngine(m)
    dense._class_state = "unavailable"
    cls = _force_class(m)
    hay = bytes(rng.choice(list(b"abcdef "), size=300_000))
    assert cls.count(hay) == dense.count(hay)
    assert cls._class_state == "ready"  # the packed path actually ran
    assert 1 < cls._n_classes <= 256
    for nt in (1, 2, 8):
        assert cls.count(hay, n_threads=nt) == dense.count(hay)
    p0, v0 = dense.matches_arrays(hay)
    p1, v1 = cls.matches_arrays(hay)
    assert np.array_equal(p0, p1) and np.array_equal(v0, v1)


def test_class_packed_composed_ci_parity():
    from alfred_margaret_tpu.models import case_dfa

    cm = case_dfa.compose_build([(n, i) for i, n in enumerate(["istanbul", "straße", "k"])])
    dense = CppAcEngine(cm)
    dense._class_state = "unavailable"
    cls = _force_class(cm)
    text = ("İstanbul STRASSE straße K filler K " * 3000).encode()
    assert cls.count(text) == dense.count(text) > 0
    pa, va = dense.matches_arrays(text)
    pb, vb = cls.matches_arrays(text)
    assert np.array_equal(pa, pb) and np.array_equal(va, vb)


def test_class_packed_amortization_policy(monkeypatch):
    """The class tables only build once cumulative scanned bytes cover the
    build cost (20x the dense table size); AMT_HOST_CLASS=0 disables."""
    monkeypatch.delenv("AMT_HOST_CLASS", raising=False)
    m = ac.build([(b"needle", 0), (b"word", 1)])
    e = CppAcEngine(m)
    small = b"a needle in a haystack " * 10
    assert e.count(small) == 10
    assert e._class_state == "unbuilt"  # tiny scans never pay the build
    # Drive cumulative bytes over the threshold: builds and stays exact.
    big = b"needle word " * (e._CLASS_AMORTIZE * m.delta.size * 4 // 12 + 1024)
    n_dense = CppAcEngine(m).count(big)
    assert e.count(big) == n_dense
    assert e._class_state == "ready"
    assert e.count(big) == n_dense  # steady-state packed scan, same answer
    # Kill switch (monkeypatch restores any pre-set value afterwards).
    monkeypatch.setenv("AMT_HOST_CLASS", "0")
    e2 = CppAcEngine(m)
    assert e2.count(big) == n_dense
    assert e2._class_state == "unavailable"


def test_class_packed_field_overflow_falls_back():
    """Machines whose premultiplied index or count would overflow the
    packed fields must refuse the class path (and stay correct)."""
    m = ac.build([(b"ab", 0), (b"b", 1)])
    e = _force_class(m)
    # Simulate a state space too large for state*C < 2^24 by inflating the
    # reported state count (the guard reads machine.n_states via delta).
    import unittest.mock as mock

    with mock.patch.object(
        type(m), "n_states", property(lambda self: 1 << 24)
    ):
        hay = b"ab b ab " * 64
        dense = CppAcEngine(m)
        dense._class_state = "unavailable"
        assert e.count(hay) == dense.count(hay)
        assert e._class_state == "unavailable"


def test_class_packed_first_hit_and_value_presence_parity():
    rng = np.random.default_rng(33)
    needles = [bytes(rng.choice(list(b"abcd"), size=rng.integers(2, 6))) for _ in range(10)]
    m = ac.build([(n, i) for i, n in enumerate(dict.fromkeys(needles))])
    dense = CppAcEngine(m)
    dense._class_state = "unavailable"
    cls = _force_class(m)
    hit_hay = bytes(rng.choice(list(b"abcdxyz "), size=200_000))
    miss_hay = bytes(rng.choice(list(b"xyz 123"), size=200_000))
    # first_hit: existence semantics must agree (witness positions may
    # differ across thread schedules, so compare presence, and exact
    # position single-threaded where the scan is deterministic).
    assert (dense.first_hit(hit_hay) >= 0) == (cls.first_hit(hit_hay) >= 0)
    assert cls._class_state == "ready"
    assert dense.first_hit(miss_hay) == cls.first_hit(miss_hay) == -1
    assert dense.first_hit(hit_hay, n_threads=1) == cls.first_hit(hit_hay, n_threads=1)
    nv = len(m.values)
    pa = dense.value_presence(hit_hay, nv)
    pb = cls.value_presence(hit_hay, nv)
    assert np.array_equal(pa, pb)
    assert not cls.value_presence(miss_hay, nv).any()
