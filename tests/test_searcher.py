"""Searcher tests, porting the reference's AhoCorasickSpec Searcher section
(`tests/Data/Text/AhoCorasickSpec.hs:165-218`)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu import CASE_SENSITIVE, IGNORE_CASE, Searcher
from alfred_margaret_tpu.utils import utf8


class TestContainsAny:
    def test_readme_examples(self):
        needles = ["tshirt", "shirts", "shorts"]
        searcher = Searcher.build(CASE_SENSITIVE, needles)
        assert searcher.contains_any("short tshirts") is True
        assert searcher.contains_any("long shirt") is False
        assert searcher.contains_any("Short TSHIRTS") is False

        searcher_ci = Searcher.build(IGNORE_CASE, needles)
        assert searcher_ci.contains_any("Short TSHIRTS") is True

    def test_iliad(self):
        iliad = "Ἄνδρα μοι ἔννεπε, Μοῦσα, πολύτροπον, ὃς μάλα πολλὰ"
        for needles, expected in [(["μοι"], True), (["Ὀδυσεύς"], False)]:
            searcher = Searcher.build(CASE_SENSITIVE, needles)
            assert searcher.contains_any(iliad) is expected

    def test_iliad_ignore_case(self):
        iliad = "ἌΝΔΡΑ ΜΟΙ ἜΝΝΕΠΕ, ΜΟΥ͂ΣΑ, ΠΟΛΎΤΡΟΠΟΝ, ὋΣ ΜΆΛΑ ΠΟΛΛᾺ"
        searcher = Searcher.build(IGNORE_CASE, ["μοι"])
        assert searcher.contains_any(iliad) is True


class TestContainsAll:
    def test_empty_needle_never_true(self):
        searcher = Searcher.build_needle_id_searcher(CASE_SENSITIVE, [""])
        for haystack in ["", "a", "hello world"]:
            assert searcher.contains_all(haystack) is False

    def test_no_needles_vacuously_true(self):
        searcher = Searcher.build_needle_id_searcher(CASE_SENSITIVE, [])
        assert searcher.contains_all("anything") is True

    @given(
        st.lists(st.text(min_size=1, max_size=4), max_size=4),
        st.text(max_size=50),
    )
    @settings(max_examples=200, deadline=None)
    def test_equivalent_to_is_infix_of(self, needles, haystack):
        searcher = Searcher.build_needle_id_searcher(CASE_SENSITIVE, needles)
        expected = all(n in haystack for n in needles)
        assert searcher.contains_all(haystack) is expected

    @given(
        st.lists(st.text(min_size=1, max_size=4), max_size=4),
        st.text(max_size=50),
    )
    @settings(max_examples=200, deadline=None)
    def test_equivalent_to_is_infix_of_ignore_case(self, needles, haystack):
        lower_needles = [utf8.lower_str(n) for n in needles]
        lower_haystack = utf8.lower_str(haystack)
        searcher = Searcher.build_needle_id_searcher(IGNORE_CASE, lower_needles)
        expected = all(n in lower_haystack for n in lower_needles)
        assert searcher.contains_all(haystack) is expected


class TestSearcherStructure:
    def test_eq_hash_by_needles(self):
        a = Searcher.build(CASE_SENSITIVE, ["foo", "bar"])
        b = Searcher.build(CASE_SENSITIVE, ["foo", "bar"])
        c = Searcher.build(CASE_SENSITIVE, ["foo"])
        d = Searcher.build(IGNORE_CASE, ["foo", "bar"])
        assert a == b and hash(a) == hash(b)
        assert a != c and a != d

    def test_json_roundtrip(self):
        a = Searcher.build(IGNORE_CASE, ["foo", "bär"])
        b = Searcher.from_json(a.to_json())
        assert a == b
        assert b.contains_any("BÄR") is True

    def test_semigroup_concat(self):
        a = Searcher.build(CASE_SENSITIVE, ["foo"])
        b = Searcher.build(CASE_SENSITIVE, ["bar"])
        c = a + b
        assert c.contains_any("xbarx") and c.contains_any("xfoox")
        with pytest.raises(ValueError):
            a + Searcher.build(IGNORE_CASE, ["baz"])

    def test_set_case_sensitivity(self):
        a = Searcher.build(CASE_SENSITIVE, ["foo"])
        assert a.contains_any("FOO") is False
        assert a.set_case_sensitivity(IGNORE_CASE).contains_any("FOO") is True

    def test_map_searcher(self):
        a = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["x", "y"])
        doubled = a.map_searcher(lambda v: v * 10)
        ms = doubled.all_matches("xy")
        assert [m.value for m in ms] == [0, 10]

    def test_num_needles_and_needles(self):
        a = Searcher.build(CASE_SENSITIVE, ["foo", "bar"])
        assert a.num_needles == 2
        assert [n for n, _ in a.needles] == [b"foo", b"bar"]


class TestEngineParity:
    """python and xla engines must agree on every op."""

    @given(
        st.lists(st.text(alphabet="abAB", min_size=1, max_size=3), min_size=1, max_size=5),
        st.text(alphabet="abAB", max_size=80),
    )
    @settings(max_examples=50, deadline=None)
    def test_contains_and_count(self, needles, haystack):
        for case in (CASE_SENSITIVE, IGNORE_CASE):
            ndl = [utf8.lower_str(n) for n in needles] if case is IGNORE_CASE else needles
            py = Searcher.build(case, ndl, engine="python")
            xla = Searcher.build(case, ndl, engine="xla")
            assert py.contains_any(haystack) == xla.contains_any(haystack)
            assert py.count_matches(haystack) == xla.count_matches(haystack)
            assert py.all_matches(haystack) == xla.all_matches(haystack)


class TestStagedHaystack:
    def test_staged_matches_all_ops(self):
        from alfred_margaret_tpu.searcher import Searcher
        from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE

        s = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["ab", "bc", "c"])
        hay = "xabcabx" * 2000
        st = s.stage(hay)
        assert s.count_matches(st) == s.count_matches(hay)
        assert s.contains_any(st) == s.contains_any(hay)
        assert s.contains_all(st) == s.contains_all(hay)
        assert [(m.pos, m.value) for m in s.all_matches(st)] == [
            (m.pos, m.value) for m in s.all_matches(hay)
        ]

    def test_staged_case_mismatch_raises(self):
        import pytest as _pytest

        from alfred_margaret_tpu.searcher import Searcher
        from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE

        s_cs = Searcher.build(CASE_SENSITIVE, ["ab"])
        s_ci = Searcher.build(IGNORE_CASE, ["ab"])
        st = s_ci.stage("ABab" * 2000)
        with _pytest.raises(ValueError):
            s_cs.count_matches(st)


def test_broken_jax_runtime_falls_back_to_host(monkeypatch):
    """When the JAX runtime cannot initialize (engine._jax_backend reports
    "none"), auto dispatch must degrade to the jax-free host engines, not
    crash.  The failure is injected in-process — a bogus JAX_PLATFORMS
    subprocess would be vacuous on hosts whose accelerator plugin ignores
    the env var (this machine's does)."""
    from alfred_margaret_tpu import engine as engine_mod
    from alfred_margaret_tpu.searcher import Searcher

    monkeypatch.setattr(engine_mod, "_jax_backend", lambda: "none")
    s = Searcher.build(CASE_SENSITIVE, ["tshirt"])
    data = b"xx tshirt yy " * 50000
    backend = s._engine._pick(len(data))
    assert backend in ("cpp", "python")
    assert s.count_matches(data) == 50000


def test_all_matches_arrays_agrees_with_list():
    s = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["ab", "b", "abab"])
    hay = "xababx" * 50
    ms = s.all_matches(hay)
    ends, vids = s.all_matches_arrays(hay)
    assert [(m.pos, m.value) for m in ms] == [
        (int(e), int(v)) for e, v in zip(ends, vids)
    ]


def test_staged_owner_mismatch_raises():
    """A staged haystack carries its machine's stream plan; any other
    searcher must reject it (regression: silently wrong boundary matches)."""
    s1 = Searcher.build(CASE_SENSITIVE, ["foo"])
    s2 = Searcher.build(CASE_SENSITIVE, ["longerneedlehere"])
    st = s1.stage("foo x" * 2000)
    with pytest.raises(ValueError):
        s2.count_matches(st)
    assert s1.count_matches(st) == 2000


class TestAdoptStaged:
    """Cross-searcher staged-haystack adoption (live needle-set swap): the
    corpus's stream layout is machine-independent, so a new searcher reuses
    the resident staging instead of re-transferring — validated against the
    new machine's synchronization window, restaged when incompatible."""

    def test_adopt_reuses_device_streams(self):
        s1 = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["foofoofoo", "barbarbar"])
        s2 = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["oof", "rba"])
        hay = "foofoofoo x rba y " * 3000
        st1 = s1.stage(hay)
        st2 = s2.adopt_staged(st1)
        assert s2.count_matches(st2) == s2.count_matches(hay)
        assert s2.contains_any(st2)
        assert [(m.pos, m.value) for m in s2.all_matches(st2)] == [
            (m.pos, m.value) for m in s2.all_matches(hay)
        ]
        # s2's needles are shorter than s1's -> overlap suffices -> the
        # device streams must be THE SAME object (no re-transfer).
        if st1.device is not None:
            assert st2.device is st1.device

    def test_adopt_restages_when_overlap_insufficient(self):
        s1 = Searcher.build(CASE_SENSITIVE, ["ab"])
        s2 = Searcher.build(CASE_SENSITIVE, ["abcdefghij" * 3])
        hay = ("ab" + "abcdefghij" * 3 + "x") * 1500
        st1 = s1.stage(hay)
        st2 = s2.adopt_staged(st1)
        # short-needle staging (overlap 1) cannot cover the 30-byte needle;
        # adoption must restage, and results must still be exact.
        assert s2.count_matches(st2) == s2.count_matches(hay) == 1500
        if st1.device is not None and st2.device is not None:
            assert st2.device is not st1.device

    def test_adopt_ignore_case_reuses_lowering(self):
        from alfred_margaret_tpu.utils import config

        import dataclasses

        saved = config.DEFAULT
        config.DEFAULT = dataclasses.replace(saved, composed_ci_max_states=0)
        try:
            s1 = Searcher.build_needle_id_searcher(IGNORE_CASE, ["straße"])
            s2 = Searcher.build_needle_id_searcher(IGNORE_CASE, ["ab"])
            hay = "STRAßE ab AB xyz " * 2000
            st1 = s1.stage(hay)
            st2 = s2.adopt_staged(st1)
            assert st2.lowered is st1.lowered  # lowering pass reused
            assert s2.count_matches(st2) == s2.count_matches(hay)
        finally:
            config.DEFAULT = saved

    def test_adopt_lowered_into_case_sensitive_raises(self):
        from alfred_margaret_tpu.utils import config

        import dataclasses

        saved = config.DEFAULT
        config.DEFAULT = dataclasses.replace(saved, composed_ci_max_states=0)
        try:
            s_ci = Searcher.build(IGNORE_CASE, ["ab"])
            s_cs = Searcher.build(CASE_SENSITIVE, ["AB"])
            st = s_ci.stage("ABab" * 2000)
            with pytest.raises(ValueError):
                s_cs.adopt_staged(st)
        finally:
            config.DEFAULT = saved

    def test_adopt_raw_into_composed_ci(self):
        import alfred_margaret_tpu.engine as engine_mod

        saved = engine_mod.MatchEngine.AUTO_COMPOSE_BYTES
        engine_mod.MatchEngine.AUTO_COMPOSE_BYTES = 0  # force composition
        try:
            s_cs = Searcher.build_needle_id_searcher(CASE_SENSITIVE, ["tshirt"])
            s_ci = Searcher.build_needle_id_searcher(IGNORE_CASE, ["TShirt", "K"])
            hay = "TSHIRT tshirt K x " * 2000
            st_cs = s_cs.stage(hay)
            st_ci = s_ci.adopt_staged(st_cs)
            assert st_ci.composed
            assert s_ci.count_matches(st_ci) == s_ci.count_matches(hay)
        finally:
            engine_mod.MatchEngine.AUTO_COMPOSE_BYTES = saved
