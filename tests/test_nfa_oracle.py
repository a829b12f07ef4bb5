"""Independent NFA oracle: parity with the DFA stack + mutation sensitivity.

The key property (mirroring the reference's cross-implementation benchmark
protocol, /root/reference/benchmark/benchmark.py:65-69): the oracle shares
no construction code with models.ac, so a seeded builder bug that every
table-executing engine reproduces identically is still caught.
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.models.nfa_oracle import NfaOracle, cross_check_counts
from alfred_margaret_tpu.bench.dataformat import synth_corpus


CASES = [
    ["tshirt", "shirts", "shorts"],
    ["abc", "abcd", "bcd", "c", "bc"],
    ["a", "aa", "aaa"],  # heavy overlap / suffix chains
    ["ab", "ba"],  # alternation
    ["İstanbul".encode(), "ß".encode(), b"\xff\xfe"],  # non-ASCII bytes
]


@pytest.mark.parametrize("needles", CASES, ids=[str(i) for i in range(len(CASES))])
def test_match_parity(needles):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    oracle = NfaOracle(needles)
    if any(isinstance(n, bytes) for n in needles):
        rng = np.random.default_rng(13)
        nb = [n if isinstance(n, bytes) else n.encode() for n in needles]
        parts = [bytes(rng.integers(0, 256, size=7, dtype=np.uint8)) for _ in range(40)]
        corpus = b"".join(p + nb[i % len(nb)] for i, p in enumerate(parts))
    else:
        corpus = synth_corpus(needles, 1 << 14, hit_fraction=0.08, seed=13)
    want = [(x.pos, x.value) for x in ac.all_matches(m, corpus)]
    got = oracle.all_matches(corpus)
    assert got == want


def test_count_parity_random_pool():
    rng = np.random.default_rng(5)
    for trial in range(8):
        frags = ["".join(chr(97 + c) for c in rng.integers(0, 4, size=rng.integers(1, 4))) for _ in range(6)]
        needles = list(dict.fromkeys("".join(rng.choice(frags, size=rng.integers(1, 3))) for _ in range(10)))
        hay = "".join(rng.choice(frags, size=200))
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        assert NfaOracle(needles).count(hay) == ac.count_matches(m, hay)


def test_empty_needle_piggyback_quirk():
    # The reference leaks the empty needle's value into every non-root
    # state's flattened output set (Automaton.hs:367-380); the engines
    # reproduce it and the oracle must AGREE (round-2's oracle dropped
    # empty needles and raised false conformance violations).
    needles = ["", "ab"]
    oracle = NfaOracle(needles)
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    for hay in ("abab", "xx", "aXab", "bbb"):
        want = [(x.pos, x.value) for x in ac.all_matches(m, hay)]
        assert oracle.all_matches(hay) == want, hay
        assert oracle.count(hay) == len(want)
    # Never matches where no state ever leaves the root.
    assert oracle.all_matches("xx") == []
    assert oracle.count("abab") == 6  # 'a':empty, 'ab':ab+empty, twice
    # Two empty needles: later-inserted payload first (insertWith (++)).
    o2 = NfaOracle(["", "a", ""])
    m2 = ac.build([("", 0), ("a", 1), ("", 2)])
    want2 = [(x.pos, x.value) for x in ac.all_matches(m2, "za")]
    assert o2.all_matches("za") == want2 == [(2, 1), (2, 2), (2, 0)]
    # Mid-code-point suppression: empty value fires once per code point.
    o3 = NfaOracle(["", "é"])
    m3 = ac.build([("", 0), ("é", 1)])
    want3 = [(x.pos, x.value) for x in ac.all_matches(m3, "éé")]
    assert o3.all_matches("éé") == want3


def test_contains_any():
    oracle = NfaOracle(["abc"])
    assert oracle.contains_any("zzabczz") is True
    assert oracle.contains_any("zzabzz") is False


def test_cross_check_helper():
    needles = ["ab", "bc"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    cross_check_counts(needles, "xabcx", ac.count_matches(m, "xabcx"))
    with pytest.raises(AssertionError):
        cross_check_counts(needles, "xabcx", 99)


def test_mutation_caught_by_oracle_not_by_cpp():
    """Seed a construction bug into the built tables: every table-executing
    engine (here the C++ engine) reproduces it bit-for-bit, the independent
    NFA does not — proving the oracle adds real conformance power."""
    needles = ["abc", "abcd", "bcd"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = b"zabcdz" * 50
    good = ac.count_matches(m, corpus)

    # Mutation: drop the failure-resolved transition that re-enters 'b...'
    # from the state for "abc" on byte 'd' (redirect to root).  This is the
    # classic buildFallbackMap bug class (failure chain not followed).
    s = 0
    for b in b"abc":
        s = int(m.delta[s, b])
    mutated = m.delta.copy()
    assert mutated[s, ord("d")] != 0
    mutated[s, ord("d")] = 0
    m_bug = ac.AcMachine(
        delta=mutated,
        out_offset=m.out_offset,
        out_values=m.out_values,
        match_count=m.match_count,
        values=m.values,
        needles=m.needles,
        max_needle_bytes=m.max_needle_bytes,
        fail=m.fail,
    )
    bad = ac.count_matches(m_bug, corpus)
    assert bad != good  # the corpus exercises the mutated transition

    # The C++ engine runs the same (mutated) tables: it AGREES with the bug.
    try:
        from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

        cpp = CppAcEngine(m_bug)
        assert cpp.count(np.frombuffer(corpus, dtype=np.uint8)) == bad
    except Exception:
        pass  # native engine unavailable: the oracle check below still holds

    # The independent NFA disagrees with the mutated tables — caught.
    with pytest.raises(AssertionError):
        cross_check_counts(needles, corpus, bad)
    cross_check_counts(needles, corpus, good)
