"""Vendored known-answer conformance corpus (VERDICT r2 item 8).

``tests/data/golden_corpus.npz`` holds needle sets, corpora and the full
expected (end, needle-id) match lists derived INDEPENDENTLY by plain
``bytes.find`` (``experiments/gen_golden_corpus.py``) — the network-less
analogue of the reference's four-implementation count protocol
(``/root/reference/benchmark/benchmark.py:65-69``).  Every engine family
is checked against the frozen artifact, and the artifact itself is spot
re-derived at test time to guard against rot.
"""
import os

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.models.nfa_oracle import NfaOracle

DATA = os.path.join(os.path.dirname(__file__), "data", "golden_corpus.npz")


def load_sets():
    z = np.load(DATA)
    names = bytes(z["names"]).decode().split("\n")
    for name in names:
        lens = z[f"{name}/needle_lens"]
        blob = bytes(z[f"{name}/needles"])
        offs = np.concatenate([[0], np.cumsum(lens)])
        needles = [blob[offs[i]:offs[i + 1]] for i in range(len(lens))]
        corpus = bytes(z[f"{name}/corpus"])
        yield name, needles, corpus, z[f"{name}/ends"], z[f"{name}/vids"]


SETS = list(load_sets())


@pytest.mark.parametrize("name,needles,corpus,ends,vids", SETS, ids=[s[0] for s in SETS])
def test_scalar_interpreter_vs_golden(name, needles, corpus, ends, vids):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    got = ac.all_matches(m, corpus)
    assert len(got) == len(ends)
    assert all(g.pos == int(e) and g.value == int(v) for g, e, v in zip(got, ends, vids))


@pytest.mark.parametrize("name,needles,corpus,ends,vids", SETS, ids=[s[0] for s in SETS])
def test_cpp_engine_vs_golden(name, needles, corpus, ends, vids):
    from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
    from alfred_margaret_tpu.ops.xla_scan import extract_matches

    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = CppAcEngine(m)
    data = np.frombuffer(corpus, dtype=np.uint8)
    assert eng.count(data) == len(ends)
    states = eng.final_states(data)
    ce, cv = extract_matches(m, states)
    assert np.array_equal(ce, ends) and np.array_equal(cv, vids)


@pytest.mark.parametrize("name,needles,corpus,ends,vids", SETS, ids=[s[0] for s in SETS])
def test_nfa_oracle_vs_golden_slice(name, needles, corpus, ends, vids):
    # The NFA oracle is scalar Python: check a prefix slice only.
    cut = 8192
    sl = corpus[:cut]
    keep = ends <= cut  # matches fully inside the slice
    want = [(int(e), int(v)) for e, v in zip(ends[keep], vids[keep])]
    assert NfaOracle(needles).all_matches(sl) == want


@pytest.mark.parametrize("name,needles,corpus,ends,vids", SETS, ids=[s[0] for s in SETS])
def test_artifact_rot_guard(name, needles, corpus, ends, vids):
    # Re-derive one needle's occurrences with bytes.find at test time: a
    # stale or corrupted artifact cannot silently pass.
    vid = int(np.argmax([len(n) for n in needles]))
    n = needles[vid]
    got = []
    start = 0
    while True:
        i = corpus.find(n, start)
        if i < 0:
            break
        got.append(i + len(n))
        start = i + 1
    want = [int(e) for e, v in zip(ends, vids) if int(v) == vid]
    assert got == want


def test_pallas_interpret_vs_golden_counts():
    # One device-kernel family on the smallest set (interpret mode is slow).
    import jax

    name, needles, corpus, ends, vids = SETS[3]  # overlap-torture
    from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

    m = ac.build([(n, i) for i, n in enumerate(needles)])
    e = PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True)
    assert e.count(np.frombuffer(corpus, dtype=np.uint8)) == len(ends)
