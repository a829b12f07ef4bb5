"""Native prefilter-verify engine (large needle sets, min length >= 5)."""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus

pytest.importorskip("ctypes")


def _engine(needles):
    from alfred_margaret_tpu.native.prefilter import PrefilterEngine
    from alfred_margaret_tpu.native.build import NativeUnavailable

    try:
        return PrefilterEngine(needles)
    except NativeUnavailable:
        pytest.skip("no native toolchain")


def test_count_parity_10k():
    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(5, 12)))
            for _ in range(3000)
        )
    )[:2500]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles[:200], 1 << 21, hit_fraction=0.02, seed=11)
    pf = _engine(needles)
    assert pf.count(corpus) == ac.count_matches(m, corpus)


def test_overlaps_and_duplicates():
    needles = ["aaaaa", "aaaaaa", "ababa", "ababa"]  # duplicate listed twice
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = b"aaaaaaaa abababa xx" * 50
    pf = _engine(needles)
    assert pf.count(hay) == ac.count_matches(m, hay)


def test_eligibility_gate():
    from alfred_margaret_tpu.native.prefilter import eligible

    assert eligible([b"abcde", b"zzzzzz"])
    assert not eligible([b"abcd"])  # 4 bytes
    assert not eligible([])


def test_first_hit_and_tails():
    needles = ["qqqqq", "wwwww"]
    pf = _engine(needles)
    assert pf.first_hit(b"zzz qqqqq") == 4
    assert pf.first_hit(b"zzzz") == -1
    assert pf.count(b"qqqq") == 0  # shorter than any needle
    assert pf.count(b"") == 0
    # match at the very end / crossing nothing
    assert pf.count(b"xxqqqqq") == 1
    # needle tail must not read past the corpus
    assert pf.count(b"xxqqqq") == 0


def test_binary_needles():
    needles = [b"\x00\x01\x02\x03\x04", b"\xff\xfe\xfd\xfc\xfb\xfa"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = b"\x00\x01\x02\x03\x04 junk \xff\xfe\xfd\xfc\xfb\xfa" * 20
    pf = _engine(needles)
    assert pf.count(hay) == ac.count_matches(m, hay)


def test_never_on_composed_ci_machine(monkeypatch):
    """Regression (round-2 review): a composed case-folding machine carries
    ORIGINAL-case needles while its delta folds — byte-exact prefiltering
    would silently turn IGNORE_CASE into CaseSensitive results."""
    from alfred_margaret_tpu.engine import MatchEngine
    from alfred_margaret_tpu.searcher import Searcher
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    monkeypatch.setenv("AMT_PREFILTER", "1")
    monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)
    s = Searcher.build(IGNORE_CASE, ["tshirt", "kelvin"], engine="cpp")
    hay = "TSHIRT tshirt KELVIN kelvin " * 50
    assert s.count_matches(hay) == 200
    assert s.contains_any("TSHIRT ONLY UPPER") is True
    # The composed inner engine must have refused the prefilter.
    ci = s._engine._composed(IGNORE_CASE)
    assert ci is not None and ci._prefilter() is None
