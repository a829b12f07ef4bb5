"""Case-insensitive bitap: byte-class tracks over the composed-CI regime.

The CI bitap (``plan_bitap_ci``) matches the composed case-folding DFA's
raw-byte semantics with per-position byte SETS (same-length unlowerings)
plus a sticky trap word for the 25 length-changing unlowerings (İ→i, K→k,
Å→å, ẞ→ß, …), falling back to the exact composed dense kernel when one
occurs.  Parity here is cross-algorithm conformance against the scalar
IgnoreCase oracle (``run_with_case``/``count_matches``, mirroring
``AhoCorasick/Automaton.hs:468-480`` semantics).
"""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac, case_dfa
from alfred_margaret_tpu.ops.bitap_scan import (
    BitapAcEngine,
    ci_track_key,
    plan_bitap,
    plan_bitap_ci,
)
from alfred_margaret_tpu.ops.comb_scan import make_pallas_engine
from alfred_margaret_tpu.utils import utf8
from alfred_margaret_tpu.utils.case import IGNORE_CASE


def _composed(needles):
    """Composed-CI machine over LOWERED needles (the reference lowers
    needles at automaton construction, ``Searcher.hs``)."""
    low = [utf8.lower_str(n) for n in needles]
    m = ac.build([(n, i) for i, n in enumerate(low)])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    return m, cm


def _eng(cm, lay, **kw):
    kw.setdefault("n_streams", 256)
    kw.setdefault("t_tile", 32)
    kw.setdefault("interpret", True)
    return BitapAcEngine(cm, layout=lay, **kw)


def _check_ci(needles, text: str, expect_trap_fallback=None):
    m, cm = _composed(needles)
    lay = plan_bitap_ci(cm)
    assert lay is not None and lay.ci
    data = text.encode("utf-8")
    exp = ac.count_matches(m, data, IGNORE_CASE)
    # cross-check: the composed machine scanned CaseSensitively agrees
    assert ac.count_matches(cm, data) == exp
    eng = _eng(cm, lay)
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    assert eng.count_staged(st) == exp
    assert eng.contains_staged(st) == (exp > 0)
    return eng, st, lay, exp


# ---------------------------------------------------------------- planning


def test_plan_gates():
    # ASCII without i/k: no trap word at all.
    _, cm = _composed(["shoe", "dress"])
    lay = plan_bitap_ci(cm)
    assert lay is not None and lay.trap is None
    # 'i' and 'k' pull in the İ / Kelvin-K trap encodings.
    _, cm = _composed(["kilo"])
    lay = plan_bitap_ci(cm)
    assert lay is not None and lay.has_trap
    # both trap encodings EMBED into the match word's spare bits (zero
    # extra gathers): no standalone trap register needed
    assert lay.trap is None and lay.words[0].trap_endmask != 0
    # Greek ω: the variant mix 0xCF 0xA9 decodes to a different letter —
    # the closure gate must reject (over-match otherwise).
    _, cm = _composed(["ω"])
    assert plan_bitap_ci(cm) is None
    # Cyrillic т: case pair crosses the D0/D1 lead-byte boundary.
    _, cm = _composed(["т"])
    assert plan_bitap_ci(cm) is None
    # Cyrillic и: same lead byte, closed product — eligible.
    _, cm = _composed(["ив"])
    assert plan_bitap_ci(cm) is not None
    # CS planner must keep refusing composed machines.
    assert plan_bitap(cm) is None
    # CI planner must refuse plain CS machines.
    assert plan_bitap_ci(ac.build([("abc", 0)])) is None


def test_mixed_case_duplicates_fold_into_weight():
    # "Foo" and "foo" lower to the same track; weight 2.
    _, cm = _composed(["Foo", "foo", "bar"])
    lay = plan_bitap_ci(cm)
    assert lay is not None
    weights = sorted(w for word in lay.words for _, _, w in word.fields)
    assert weights == [1, 2]
    eng, st, _, exp = _check_ci(["Foo", "foo", "bar"], "FOO foo Bar foO " * 60)
    assert exp == 3 * 60 * 2 + 60  # foo-track weight 2 at 3 occurrences


def test_ci_track_key():
    assert ci_track_key(b"FoO") == b"foo"
    assert ci_track_key("ÉcL".encode()) == "écl".encode()
    assert ci_track_key(b"\xff") is None  # not strict UTF-8


# ------------------------------------------------------------------ parity


def test_ascii_ci_parity():
    eng, st, lay, exp = _check_ci(
        ["dress", "shoe", "short"],
        "DRESS dress dReSs SHOE shoes SHORTS xdressy " * 80,
    )
    assert lay.trap is None and exp > 0
    assert eng.count_staged(st, reps=3) == 3 * exp


def test_latin1_ci_parity():
    # é/É share a lead byte; closure holds.
    eng, st, lay, exp = _check_ci(
        ["éclair", "café"], "ÉCLAIR éclair CAFÉ café ÉclAir " * 70
    )
    assert exp == 70 * 5


def test_trapless_needles_use_bitap_extraction_step():
    # No trap => the single-word matchbits step family is the bitap one.
    _, cm = _composed(["dress", "shoe"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    tabs, _, _ = eng._bits_tables()
    assert tabs[0] is eng._btab_dev


def test_presence_flags_ci():
    eng, st, lay, _ = _check_ci(["Shoe", "dress", "glove"], "SHOES and DRESS " * 40)
    pres = eng.needle_presence_staged(st)
    assert pres is not None
    assert list(pres) == [True, True, False]


# ------------------------------------------------------------- trap guard


def test_kelvin_trap_fallback_exact():
    # Kelvin sign K (U+212A) lowers to ASCII 'k': the fixed-width track
    # cannot hold the 3-byte variant, so the trap word must fire and the
    # engine must return the exact composed-kernel count.
    text = "xx " + "K\u0130LO K\u212aILO kilo tshirt " * 20  # \u0130 + Kelvin K
    _, cm = _composed(["kilo", "tshirt"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    data = text.encode("utf-8")
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    m = ac.build([("kilo", 0), ("tshirt", 1)])
    exp = ac.count_matches(m, data, IGNORE_CASE)
    assert eng.count_staged(st) == exp
    assert eng.contains_staged(st)
    # presence flags could under-report under traps: must decline.
    assert eng.needle_presence_staged(st) is None


def test_trap_negative_corpus_stays_on_fast_path():
    # İ-free corpus: counts come from the bitap path (no silent fallback —
    # checked by poisoning the dense count and seeing it NOT used).
    _, cm = _composed(["fix"])
    lay = plan_bitap_ci(cm)
    assert lay.has_trap
    eng = _eng(cm, lay)
    data = ("FIX fix fIx " * 50).encode()
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    import alfred_margaret_tpu.ops.pallas_scan as ps

    orig = ps.PallasAcEngine.count_staged

    def boom(self, st, reps=1):  # pragma: no cover - must not run
        raise AssertionError("dense fallback must not fire without a trap")

    ps.PallasAcEngine.count_staged = boom
    try:
        assert eng.count_staged(st) == 150
    finally:
        ps.PallasAcEngine.count_staged = orig


def test_istanbul_dotted_I_trap():
    # İ (U+0130, 2 bytes) lowers to 'i' (1 byte): needle "fix" must match
    # "fİx" via the composed fallback.
    _, cm = _composed(["fix"])
    lay = plan_bitap_ci(cm)
    eng = _eng(cm, lay)
    data = "no match here / fİx yes / FIX ".encode("utf-8")
    st = eng.stage(np.frombuffer(data, dtype=np.uint8))
    m = ac.build([("fix", 0)])
    exp = ac.count_matches(m, data, IGNORE_CASE)
    assert exp == 2
    assert eng.count_staged(st) == exp


# ---------------------------------------------------------------- dispatch


def test_make_pallas_engine_picks_ci_bitap(monkeypatch):
    _, cm = _composed(["dress", "shoe"])
    eng = make_pallas_engine(cm, interpret=True, n_streams=256, t_tile=32)
    assert isinstance(eng, BitapAcEngine) and eng.bitap.ci
    monkeypatch.setenv("AMT_BITAP", "0")
    eng2 = make_pallas_engine(cm, interpret=True, n_streams=256, t_tile=32)
    assert not isinstance(eng2, BitapAcEngine)


# -------------------------------------------------------------------- fuzz


def test_ci_fuzz_vs_scalar_oracle():
    rng = np.random.default_rng(123)
    letters = list("abefghjé")  # includes a 2-byte Latin-1 letter
    trapless = True
    for trial in range(10):
        needles = list(
            dict.fromkeys(
                "".join(rng.choice(letters, size=int(rng.integers(1, 6))))
                for _ in range(int(rng.integers(2, 7)))
            )
        )
        m, cm = _composed(needles)
        lay = plan_bitap_ci(cm)
        assert lay is not None
        frags = needles + ["xy", "é", "zz"]
        hay = "".join(
            frags[i]
            for i in rng.integers(0, len(frags), size=int(rng.integers(40, 300)))
        )
        # random case flips (str.upper keeps these letters same-length)
        hay = "".join(
            c.upper() if rng.random() < 0.4 else c for c in hay
        )
        if rng.random() < 0.3:
            hay += "İK"  # sprinkle traps in some trials
        data = hay.encode("utf-8")
        eng = _eng(cm, lay)
        st = eng.stage(np.frombuffer(data, dtype=np.uint8))
        exp = ac.count_matches(m, data, IGNORE_CASE)
        assert eng.count_staged(st) == exp, (trial, needles, hay[:80])
        assert eng.contains_staged(st) == (exp > 0)


def test_streaming_over_ci_bitap():
    # Out-of-core chunked CI scanning over the byte-class bitap engine:
    # chunk boundaries + trap-fire fallback must both stay exact.
    from alfred_margaret_tpu.models import case_dfa
    from alfred_margaret_tpu.ops.bitap_scan import plan_bitap_ci
    from alfred_margaret_tpu.ops.streaming import StreamingScanner
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    m = ac.build([(n, i) for i, n in enumerate(["dress", "kilo"])])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    lay = plan_bitap_ci(cm)
    assert lay is not None and lay.has_trap
    eng = BitapAcEngine(cm, layout=lay, n_streams=256, t_tile=32, interpret=True)
    # trapless corpus
    corpus = b"DRESS kilo dReSs KILO xx " * 700
    sc = StreamingScanner(eng, cm, chunk_bytes=4096)
    exp = ac.count_matches(m, corpus, IGNORE_CASE)
    assert sc.count(np.frombuffer(corpus, dtype=np.uint8)) == exp
    # Kelvin K in ONE chunk: only that chunk takes the dense fallback
    corpus2 = corpus + "K\u212aILO ".encode() + corpus
    exp2 = ac.count_matches(m, corpus2, IGNORE_CASE)
    sc2 = StreamingScanner(eng, cm, chunk_bytes=4096)
    assert sc2.count(np.frombuffer(corpus2, dtype=np.uint8)) == exp2


def test_ci_closure_sampled_exhaustive():
    # Deterministic sample of the exhaustive per-code-point differential
    # (experiments/ci_closure_exhaustive.py ran the full 1,424-cp sweep on
    # 2026-08-20: 1,034 closure-eligible, 1,010 trapless trials checked,
    # 0 mismatches).  The suite keeps every 29th cased code point hot.
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "ci_closure_exhaustive",
        os.path.join(os.path.dirname(__file__), "..", "experiments",
                     "ci_closure_exhaustive.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cased = sorted(set(utf8._unlower_map().keys()))[::29]
    eligible, checked, mismatches = mod.run(cased)
    assert not mismatches, mismatches
    assert eligible >= 20 and checked >= 15  # the sample stays meaningful
