"""Stride-2 sticky candidate filter (ops.filter_scan): the hit-sparse
containsAny fast path attached to the comb16 engine (round 5).

Exactness contract: verdicts must equal the exact sticky scan on every
corpus — the filter may only SHORT-CIRCUIT (exact short-needle hit, or no
fire anywhere); candidate fires defer to the exact scan.  The candidate
plane must be a superset of true long-needle match ends (tested directly
on corpora with matches at stream tails, valid-end edges, and warm-up
overlap spans).
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.filter_scan import filter_contains, plan_filter


def _needles100(n=60):
    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(n + 20)
        )
    )[:n]
    needles[:2] = ["abc", "c"]
    return needles


def _eng(needles, **kw):
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    kw.setdefault("n_streams", 256)
    kw.setdefault("t_tile", 32)
    kw.setdefault("interpret", True)
    return m, Comb16PallasAcEngine(m, **kw)


def test_plan_shapes():
    needles = _needles100()
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    lay = plan_filter(m)
    assert lay is not None
    assert 1 <= lay.n_words <= 3
    assert len(lay.shorts) == 2  # "abc", "c" (len-4 needles ride the chains)
    # NUL / empty needles are ineligible
    assert plan_filter(ac.build([("a\x00b", 0)])) is None
    # composed-CI machines are ineligible
    from alfred_margaret_tpu.models import case_dfa

    cm = case_dfa.compose_build([(b"kilo", 0)])
    assert plan_filter(cm) is None


def test_filter_attached_and_verdicts():
    needles = _needles100()
    m, eng = _eng(needles)
    assert eng._filter_lay is not None

    filler = ("." * 63 + " ") * 1024  # no a-z: nothing can fire
    st = eng.stage(np.frombuffer(filler.encode(), dtype=np.uint8))
    assert filter_contains(eng, st) is False
    assert eng.contains_staged(st) is False

    # exact short-needle hit short-circuits True
    hay = filler[:500] + "abc" + filler[503:]
    st2 = eng.stage(np.frombuffer(hay.encode(), dtype=np.uint8))
    assert filter_contains(eng, st2) is True
    assert eng.contains_staged(st2) is True

    # long-needle hit: candidate fires (None) and the exact scan says True
    hay3 = filler[:500] + needles[10] + filler[500 + len(needles[10]):]
    st3 = eng.stage(np.frombuffer(hay3.encode(), dtype=np.uint8))
    assert filter_contains(eng, st3) is None  # superset: must not miss
    assert eng.contains_staged(st3) is True


def test_candidate_superset_at_edges():
    """A long-needle match at the very end of the corpus (the valid-end
    freeze edge: the needle's last byte is the last valid byte, its pair
    partner is padding) and matches spanning stream warm-up boundaries
    must all fire the candidate plane."""
    needles = _needles100()
    m, eng = _eng(needles)
    nd = needles[20]
    base = ("x" * 97 + " ") * 300  # 'x' rarely collides; deterministic
    for pos in ("end", "start", "odd", "even"):
        if pos == "end":
            hay = base + nd
        elif pos == "start":
            hay = nd + base
        elif pos == "odd":
            hay = base[:501] + nd + base[501:]
        else:
            hay = base[:500] + nd + base[500:]
        st = eng.stage(np.frombuffer(hay.encode(), dtype=np.uint8))
        got = filter_contains(eng, st)
        assert got is not False, (pos, got)  # candidate or exact-True
        assert eng.contains_staged(st) is True, pos


def test_fuzz_verdict_parity():
    """Random corpora: contains_staged (filter + fallback) must equal the
    pure exact sticky scan with the filter disabled."""
    import os

    needles = _needles100(40)
    m, eng = _eng(needles)
    os.environ["AMT_FILTER"] = "0"
    try:
        m2, eng_off = _eng(needles)
        assert eng_off._filter_lay is None
    finally:
        os.environ.pop("AMT_FILTER", None)
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(200, 4000))
        hay = rng.choice(
            np.frombuffer(b"abcdefghijklmnopqrstuvwxyz .", dtype=np.uint8), size=n
        )
        if trial % 2:
            at = int(rng.integers(0, max(1, n - 12)))
            nd = needles[int(rng.integers(0, len(needles)))].encode()
            hay[at : at + len(nd)] = np.frombuffer(nd, dtype=np.uint8)
        data = hay.astype(np.uint8)
        want = eng_off.contains_staged(eng_off.stage(data))
        got = eng.contains_staged(eng.stage(data))
        oracle = ac.count_matches(m, data.tobytes()) > 0
        assert got == want == oracle, (trial, got, want, oracle)


def test_shorts_only_layout_is_exact():
    """All-short needle sets: the filter alone is exact (no candidates
    ever, True/False verdicts straight from the compare planes)."""
    m, eng = _eng(["ab", "xyz", "q"])
    assert eng._filter_lay is not None and eng._filter_lay.n_words == 0
    st = eng.stage(np.frombuffer(b"hello world" * 500, dtype=np.uint8))
    assert filter_contains(eng, st) is False
    st2 = eng.stage(np.frombuffer(b"hello woqld" * 500, dtype=np.uint8))
    assert filter_contains(eng, st2) is True


def test_grouped_engine_filter():
    """400-needle grouped engines screen containsAny through the filter:
    no-hit corpora answer without any group sticky pass; hit corpora stay
    exact through the fused/per-group fallback."""
    import random

    from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

    random.seed(400)
    needles = sorted(
        {
            "".join(random.choices("abcdefghijklmnop", k=random.randint(4, 14)))
            for _ in range(400)
        }
    )
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    eng = GroupedPallasAcEngine(m, n_streams=256, t_tile=32, interpret=True)
    assert eng.n_groups >= 2
    assert eng._filter_lay is not None
    miss = (("." * 31 + " ") * 2000).encode()
    st = eng._stage(miss)
    assert filter_contains(eng, st) is False
    assert eng.contains_staged(st) is False
    hay = miss[:1000] + needles[7].encode() + miss[1000:]
    st2 = eng._stage(hay)
    assert eng.contains_staged(st2) is True
    oracle = ac.count_matches(m, hay) > 0
    assert oracle is True


def test_filter_self_disables_on_firey_workloads():
    """Same-alphabet text fires the chains somewhere in any large corpus;
    after FILTER_STRIKES useless screens the filter stops being consulted
    (bounded overhead), and a definite verdict resets the count."""
    from alfred_margaret_tpu.ops.filter_scan import FILTER_STRIKES

    needles = [n for n in _needles100(44) if len(n) >= 5]  # no short
    # needles: a "c"-style needle would match every random a-z corpus
    m, eng = _eng(needles)
    # Firey but matchless corpus: random a-z with no actual needle
    # (bounded regeneration; P(match) per try is ~3%).
    hay = None
    for seed in range(3, 30):
        cand = np.random.default_rng(seed).choice(
            np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8), size=6000
        ).astype(np.uint8)
        if ac.count_matches(m, cand.tobytes()) == 0:
            hay = cand
            break
    assert hay is not None
    st = eng.stage(hay)
    for i in range(FILTER_STRIKES):
        assert eng.contains_staged(st) is False  # exact fallback each time
    assert eng._filter_strikes == FILTER_STRIKES
    assert filter_contains(eng, st) is None  # self-disabled: no kernel run
    # A definite verdict resets the strikes.
    eng._filter_strikes = 0
    miss = np.frombuffer((". " * 3000).encode(), dtype=np.uint8)
    assert eng.contains_staged(eng.stage(miss)) is False
    assert eng._filter_strikes == 0
