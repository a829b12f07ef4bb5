"""Pallas kernel parity tests (interpreter mode on CPU) and compressed-
machine construction checks."""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.ops.pallas_scan import (
    CapacityError,
    CompressedMachine,
    PallasAcEngine,
)
from alfred_margaret_tpu.ops.xla_scan import extract_matches


class TestCompressedMachine:
    def test_class_count_small(self):
        m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])
        comp = CompressedMachine.from_machine(m)
        # needle bytes {t,s,h,i,r,o} + "other" = 7 classes
        assert comp.k == 7
        assert comp.rows == 1

    def test_classmap_consistency(self):
        m = ac.build([(b"ab", 0), (b"ba", 1)])
        comp = CompressedMachine.from_machine(m)
        # All non-needle bytes share one class whose column is all-roots.
        cls_of_x = comp.classmap[ord("x")]
        assert comp.classmap[ord("q")] == cls_of_x
        assert comp.classmap[ord("a")] != cls_of_x

    def test_capacity_error(self):
        rng = np.random.default_rng(0)
        needles = ["".join(chr(97 + c) for c in rng.integers(0, 26, size=8)) for _ in range(300)]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        with pytest.raises(CapacityError):
            CompressedMachine.from_machine(m, max_rows=4)

    @pytest.mark.parametrize("force", [None, 1])
    def test_packed_roundtrip(self, force):
        # >128 entries so auto-packing picks the 16-bit layout (it only
        # pays when it reduces physical rows).
        needles = [bytes([97 + i % 11, 98 + (i * 3) % 9, 99 + i % 7]) for i in range(24)]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        comp = CompressedMachine.from_machine(m, force_packing=force)
        assert comp.n_states * comp.k > 128
        assert comp.packing == (2 if force is None else 1)
        # Decode the packed entries back and compare against delta.
        packed = comp.packed.reshape(-1)
        for s in range(m.n_states):
            for b in range(256):
                idx = s * comp.k + comp.classmap[b]
                if comp.packing == 2:
                    word = int(packed[idx // 2])
                    v = (word >> 16) if idx & 1 else word
                    v &= 0xFFFF
                else:
                    v = int(packed[idx])
                assert (v & comp.state_mask) // comp.k == m.delta[s, b]
                assert (v >> comp.state_bits) == m.match_count[m.delta[s, b]]


class TestPallasInterpretParity:
    def _engine(self, m):
        return PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True, unroll=4)

    def test_readme_counts_and_positions(self):
        m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])
        eng = self._engine(m)
        hay = b"short tshirts and shorts galore " * 40
        oracle = ac.all_matches(m, hay)
        assert eng.count(hay) == len(oracle)
        states = eng.final_states(hay)
        pos, vids = extract_matches(m, states)
        assert list(pos) == [mm.pos for mm in oracle]
        assert [m.values[v] for v in vids] == [mm.value for mm in oracle]

    def test_fuzz_counts(self):
        rng = np.random.default_rng(7)
        for _ in range(3):
            needles = [bytes(rng.choice(list(b"abAB"), size=rng.integers(1, 5))) for _ in range(5)]
            m = ac.build([(n, i) for i, n in enumerate(needles)])
            eng = PallasAcEngine(m, n_streams=128, t_tile=32, interpret=True)
            hay = bytes(rng.choice(list(b"abAB"), size=2000))
            assert eng.count(hay) == ac.count_matches(m, hay)

    def test_empty(self):
        m = ac.build([(b"x", 0)])
        eng = self._engine(m)
        assert eng.count(b"") == 0
        assert len(eng.final_states(b"")) == 0

    def test_fold_boundary_byte_0x7f(self):
        # 0x7F is the classmap-fold pivot: a needle containing it must
        # disable the min(b,127) single-gather class lookup, and a needle
        # with bytes >= 0x80 must too.  Counts stay exact either way.
        for needles in ([b"a\x7fb", b"\x7f\x7f"], [b"caf\xc3\xa9", b"ab"]):
            m = ac.build([(n, i) for i, n in enumerate(needles)])
            eng = self._engine(m)
            assert not eng._fold
            hay = (b"xa\x7fb caf\xc3\xa9 \x7f\x7f\x7f \xc3\xa9z" * 50)[:997]
            assert eng.count(hay) == ac.count_matches(m, hay)

    def test_wpairs_gating_and_parity(self):
        # Few classmap boundaries -> gather-free compare chain; scattered
        # needle bytes (> WRUNS_MAX_BOUNDARIES boundaries) -> classmap
        # gather. Counts identical either way.
        from alfred_margaret_tpu.ops import pallas_scan as ps

        m_small = ac.build([(b"ab", 0), (b"bc", 1)])
        eng = self._engine(m_small)
        assert eng._wpairs is not None
        scattered = [bytes([16 * i, 16 * i + 1]) for i in range(16)]
        m_big = ac.build([(n, i) for i, n in enumerate(scattered)])
        eng_big = self._engine(m_big)
        assert eng_big._wpairs is None  # 32 boundaries > WRUNS_MAX_BOUNDARIES
        rng = np.random.default_rng(11)
        hay = bytes(rng.integers(0, 256, size=3000, dtype=np.uint8).tolist())
        for mm, ee in ((m_small, eng), (m_big, eng_big)):
            assert ee.count(hay) == ac.count_matches(mm, hay)

    def test_contains_sticky_parity(self):
        # Absorbing-state existence kernel vs oracle, incl. haystacks with
        # the match only in a stream-boundary overlap region and haystacks
        # with no match at all.
        m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])
        eng = self._engine(m)
        rng = np.random.default_rng(3)
        for hay in [
            b"short tshirts and shorts galore " * 40,
            bytes(rng.choice(list(b"xyz "), size=3000)),  # no match
            b"x" * 2999 + b"tshirt",  # match at the very end
            b"tshirt" + b"x" * 2999,  # match at the very start
            b"",
        ]:
            assert eng.contains(hay) == (ac.count_matches(m, hay) > 0), hay[:20]

    def test_contains_sticky_16bit_packing(self):
        # A machine big enough that the sticky table uses 16-bit packing.
        needles = [bytes([97 + i % 11, 98 + (i * 3) % 9, 99 + i % 7]) for i in range(24)]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = self._engine(m)
        assert eng._sticky_setup()["comp"].packing == 2
        hay = (b"".join(needles[:5]) + b"zzz") * 60
        assert eng.contains(hay)
        assert not eng.contains(b"ZQW" * 500)

    def test_contains_nul_needle_padding(self):
        # Needles containing NUL bytes must not falsely absorb in the
        # zero right-padding beyond each stream's valid end.
        m = ac.build([(b"\x00\x00a", 0)])
        eng = self._engine(m)
        assert not eng.contains(b"bcd" * 400)
        assert eng.contains(b"bc\x00\x00add" * 200)
        # ... and padding zeros followed by nothing: no match.
        assert not eng.contains(b"b" * 1000 + b"\x00\x00")

    def test_fold_enabled_ascii(self):
        # Pure-ASCII needles qualify for the folded class lookup; haystack
        # bytes >= 0x7F must still resolve to class 0 (no false matches).
        m = ac.build([(b"ab", 0), (b"bc", 1)])
        eng = self._engine(m)
        assert eng._fold and eng._in_range and eng._defer
        hay = b"ab\x7fbc\x80ab\xffab" * 30
        assert eng.count(hay) == ac.count_matches(m, hay)


class TestGroupedEngine:
    """Needle-grouped multi-pass engine (ops.grouped) parity, interpret mode."""

    def _grouped(self, m, max_rows, partition="entry"):
        from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

        return GroupedPallasAcEngine(
            m,
            max_rows=max_rows,
            partition=partition,
            n_streams=256,
            t_tile=64,
            interpret=True,
            unroll=4,
        )

    def test_partition_bounds(self):
        from alfred_margaret_tpu.ops.grouped import partition_needles
        from alfred_margaret_tpu.ops.pallas_scan import CompressedMachine

        rng = np.random.default_rng(1)
        needles = [
            bytes(rng.integers(97, 107, size=rng.integers(2, 7))) for _ in range(80)
        ]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        groups = partition_needles(m, max_rows=4)
        assert len(groups) > 1
        # Every vid appears exactly once.
        flat = sorted(v for g in groups for v in g)
        assert flat == list(range(len(needles)))
        # Every group's sub-machine really fits.
        for vids in groups:
            sub = ac.build([(m.needles[v], v) for v in vids])
            CompressedMachine.from_machine(sub, max_rows=4)

    def test_grouped_contains(self):
        rng = np.random.default_rng(2)
        needles = [
            bytes(rng.integers(97, 107, size=rng.integers(2, 7))) for _ in range(40)
        ]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        g = self._grouped(m, max_rows=4)
        assert g.n_groups > 1
        # match from the LAST group only (early-exit must still find it)
        last_needle = m.needles[g.groups[-1][0]]
        hay = b"zzz" * 200 + last_needle + b"zzz" * 200
        assert g.contains(hay)
        assert not g.contains(b"zZ" * 500)
        assert not g.contains(b"")

    def test_duplicates_share_group(self):
        from alfred_margaret_tpu.ops.grouped import partition_needles

        needles = [b"abc", b"xyz", b"abc", b"qqq", b"abc"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        groups = partition_needles(m, max_rows=1)
        by_vid = {v: gi for gi, g in enumerate(groups) for v in g}
        assert by_vid[0] == by_vid[2] == by_vid[4]

    def test_count_and_match_parity(self):
        # 20 needles / max_rows=2 still forces 3+ groups; 40 needles took
        # 220 s of interpret-mode kernel builds for the same coverage.
        rng = np.random.default_rng(2)
        needles = [
            bytes(rng.integers(97, 103, size=rng.integers(2, 5))) for _ in range(20)
        ]
        pairs = [(n, i) for i, n in enumerate(needles)]
        m = ac.build(pairs)
        eng = self._grouped(m, max_rows=2)
        assert eng.n_groups > 2
        hay = bytes(rng.integers(97, 103, size=2500))
        oracle = ac.all_matches(m, hay)
        assert eng.count(hay) == len(oracle)
        ends, vids = eng.matches_arrays(hay)
        assert [(int(e), int(v)) for e, v in zip(ends, vids)] == [
            (mt.pos, mt.value) for mt in oracle
        ]

    def test_value_presence(self):
        needles = [b"aa", b"bb", b"cc", b"dd", b"ee"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = self._grouped(m, max_rows=1)
        pres = eng.value_presence(b"xx aa yy cc zz" * 100, len(m.values))
        assert list(pres) == [True, False, True, False, False]


class TestDeviceExtraction:
    """On-device match compaction (match_positions_staged / matches_arrays)."""

    def test_matches_arrays_parity(self):
        rng = np.random.default_rng(5)
        needles = ["ab", "abc", "bc", "c", "cab"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True, unroll=4)
        hay = bytes(rng.choice([97, 98, 99, 100], size=5000).astype(np.uint8))
        oracle = ac.all_matches(m, hay)
        ends, vids = eng.matches_arrays(hay)
        assert [(int(e), int(v)) for e, v in zip(ends, vids)] == [
            (mt.pos, mt.value) for mt in oracle
        ]

    def test_empty_and_no_matches(self):
        m = ac.build([(b"zzz", 0)])
        eng = PallasAcEngine(m, n_streams=128, t_tile=32, interpret=True, unroll=4)
        ends, vids = eng.matches_arrays(b"")
        assert len(ends) == 0
        ends, vids = eng.matches_arrays(b"abcabc" * 100)
        assert len(ends) == 0

    def test_bits_compaction_branches(self):
        """Both in-jit compaction branches of the bitmap path must be exact:
        the single-level (hit-dense/degenerate, bcap >= nblocks) branch and
        the two-level block-arena branch (forced here via the small test
        block), each through capacity-overflow retries."""
        from alfred_margaret_tpu.ops.xla_scan import expand_hits

        rng = np.random.default_rng(5)
        needles = ["ab", "abc", "bc", "c", "cab"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        hay = bytes(rng.choice([97, 98, 99, 100], size=20000).astype(np.uint8))
        oracle = [(mt.pos, mt.value) for mt in ac.all_matches(m, hay)]
        for block in (512, 8):  # 512 => degenerate branch at this size
            eng = PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True, unroll=4)
            eng._bits_block = block
            eng._bits_bcap_hint = 4
            eng._bits_cap_hint = 16
            st = eng.stage(np.frombuffer(hay, dtype=np.uint8))
            pos, states = eng.match_positions_staged_bits(st)
            ends, vids = expand_hits(m, pos, states)
            assert [(int(e), int(v)) for e, v in zip(ends, vids)] == oracle, block


class TestCombEngine:
    """Row-displacement comb engine (ops.comb_scan): build verification is
    exhaustive inside ``build_comb``; these cover the kernels (interpret
    mode), the dense/comb planner, and the adaptive partitioner."""

    def _mid_machine(self, n=60, seed=4, alpha=(97, 107)):
        rng = np.random.default_rng(seed)
        needles = list(
            dict.fromkeys(
                bytes(rng.integers(*alpha, size=rng.integers(2, 7), dtype=np.uint8)) for _ in range(n * 2)
            )
        )[:n]
        return ac.build([(nd, i) for i, nd in enumerate(needles)]), rng

    def _comb_engine(self, m):
        from alfred_margaret_tpu.ops.comb_scan import CombPallasAcEngine

        return CombPallasAcEngine(m, n_streams=256, t_tile=64, interpret=True, unroll=4)

    def test_count_contains_matches_parity(self):
        m, rng = self._mid_machine()
        eng = self._comb_engine(m)
        hay = bytes(rng.integers(97, 107, size=6000, dtype=np.uint8))
        oracle = ac.all_matches(m, hay)
        assert eng.count(hay) == len(oracle)
        assert eng.contains(hay) == (len(oracle) > 0)
        assert not eng.contains(bytes(rng.integers(108, 120, size=2000, dtype=np.uint8)))
        ends, vids = eng.matches_arrays(hay)
        assert [(int(e), int(v)) for e, v in zip(ends, vids)] == [
            (mt.pos, mt.value) for mt in oracle
        ]

    def test_non_ascii_needles(self):
        # High bytes exercise the unfolded classmap path + owner checks.
        needles = ["café", "straße", "naïve", "née"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        eng = self._comb_engine(m)
        hay = ("un café, deux cafés, straße naïve née café " * 30).encode()
        assert eng.count(hay) == ac.count_matches(m, hay)

    def test_planner_prefers_dense_small(self):
        from alfred_margaret_tpu.ops.comb_scan import plan_pallas

        m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])
        kind, rows = plan_pallas(m)
        assert kind == "dense" and rows == 1

    def test_planner_prefers_comb_midtier(self):
        from alfred_margaret_tpu.ops.comb_scan import plan_pallas
        from alfred_margaret_tpu.ops.pallas_scan import CompressedMachine

        rng = np.random.default_rng(9)
        needles = list(
            dict.fromkeys(
                bytes(rng.integers(97, 123, size=rng.integers(4, 11), dtype=np.uint8))
                for _ in range(250)
            )
        )[:100]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        kind, rows = plan_pallas(m)
        assert kind in ("comb", "comb16")  # comb16 wins since round 2
        with pytest.raises(CapacityError):
            CompressedMachine.from_machine(m)  # dense cannot even fit

    def test_adaptive_partition_covers_all_vids(self):
        from alfred_margaret_tpu.ops.grouped import partition_adaptive

        rng = np.random.default_rng(1)
        needles = [
            bytes(rng.integers(97, 107, size=rng.integers(2, 7), dtype=np.uint8)) for _ in range(80)
        ]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        groups = partition_adaptive(m, max_rows=4)
        flat = sorted(v for g in groups for v in g)
        assert flat == list(range(len(needles)))

    def test_adaptive_duplicates_share_group(self):
        from alfred_margaret_tpu.ops.grouped import partition_adaptive

        needles = [b"abc", b"xyz", b"abc", b"qqq", b"abc"]
        m = ac.build([(n, i) for i, n in enumerate(needles)])
        by_vid = {
            v: gi
            for gi, g in enumerate(partition_adaptive(m, max_rows=1))
            for v in g
        }
        assert by_vid[0] == by_vid[2] == by_vid[4]

    def test_grouped_adaptive_parity(self):
        from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

        rng = np.random.default_rng(6)
        needles = list(
            dict.fromkeys(
                bytes(rng.integers(97, 103, size=rng.integers(2, 5), dtype=np.uint8)) for _ in range(200)
            )
        )[:90]
        pairs = [(n, i) for i, n in enumerate(needles)]
        m = ac.build(pairs)
        eng = GroupedPallasAcEngine(
            m, max_rows=2, partition="adaptive", n_streams=256, t_tile=64,
            interpret=True, unroll=4,
        )
        assert eng.n_groups > 1
        hay = bytes(rng.integers(97, 103, size=4000))
        oracle = ac.all_matches(m, hay)
        assert eng.count(hay) == len(oracle)
        ends, vids = eng.matches_arrays(hay)
        assert [(int(e), int(v)) for e, v in zip(ends, vids)] == [
            (mt.pos, mt.value) for mt in oracle
        ]


class TestPaddedStreamSafety:
    """Fully-padded tail streams (fixed S > needed) must never contribute
    matches or absorbs — their windows are right-padding zeros, which a
    NUL-containing needle set would otherwise match (regression)."""

    def _engine(self, m, **kw):
        return PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True, unroll=4, **kw)

    def test_nul_needle_contains_no_false_positive(self):
        m = ac.build([(b"ab", 0), (b"\x00", 1)])
        eng = self._engine(m)
        # Tiny corpus vs 256 fixed streams: most streams fully padded.
        assert eng.contains(b"qr") is False
        assert eng.count(b"qr") == 0
        assert eng.contains(b"q\x00r") is True
        assert eng.count(b"q\x00r") == 1

    def test_nul_needle_counts_exact(self):
        m = ac.build([(b"\x00\x00", 0), (b"x", 1)])
        eng = self._engine(m)
        hay = b"x\x00\x00x" * 7
        assert eng.count(hay) == ac.count_matches(m, hay)

    def test_odd_t_tile_contains_and_states(self):
        # t_tile not divisible by the preferred unroll: the fitted unroll
        # must still cover every step (regression: silently skipped steps).
        m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])
        eng = PallasAcEngine(m, n_streams=128, t_tile=24, interpret=True, unroll=3)
        hay = b"x" * 2000 + b"tshirt" + b"y" * 95
        assert eng.contains(hay) is True
        assert eng.count(hay) == 1
        states = eng.final_states(hay)
        from alfred_margaret_tpu.ops.xla_scan import extract_matches

        ends, vids = extract_matches(m, states)
        assert list(ends) == [2006]

    def test_shared_staging_nul_group(self):
        # Grouped passes share one staging; a NUL-needle group must not
        # inherit the no-freeze boundary scalars of an inert group
        # (regression: wrong counts for the NUL group).
        m_inert = ac.build([(b"abcd", 0)])
        m_nul = ac.build([(b"\x00y", 0)])
        e_inert = PallasAcEngine(m_inert, n_streams=256, t_tile=64, interpret=True, unroll=4)
        e_nul = PallasAcEngine(m_nul, n_streams=256, t_tile=64, interpret=True, unroll=4)
        data = np.frombuffer(b"q\x00y abcd zz", dtype=np.uint8)
        st = e_inert.stage(data)
        assert st.zero_inert
        assert int(np.asarray(st.bscal)[1]) == (1 << 30)
        # The non-inert engine resolves conservative scalars...
        assert int(np.asarray(e_nul._bscal_for(st))[1]) < (1 << 30)
        # ...and counts exactly on the shared staging.
        assert e_nul.count_staged(st) == ac.count_matches(m_nul, data.tobytes())
        assert e_inert.count_staged(st) == ac.count_matches(m_inert, data.tobytes())


class TestFusedGroupedCount:
    """Single-launch fused grouped count (uniform comb16 across groups)."""

    def _mid(self, n=150, seed=17):
        rng = np.random.default_rng(seed)
        needles = list(
            dict.fromkeys(
                "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
                for _ in range(n + 10)
            )
        )[:n]
        m = ac.build([(x, i) for i, x in enumerate(needles)])
        frags = [x.encode() for x in needles[:20]] + [b"zqzq"]
        hay = b"".join(frags[i] for i in rng.integers(0, len(frags), 600))
        return m, hay

    def test_fused_count_parity(self):
        from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

        m, hay = self._mid()
        eng = GroupedPallasAcEngine(
            m, max_rows=5, n_streams=256, t_tile=64, interpret=True, unroll=4
        )
        assert eng.n_groups > 1
        st = eng._stage(hay)
        expected = ac.count_matches(m, hay)
        assert eng.count_staged(st) == expected
        assert eng._fused is not None, "fused path did not engage"
        # reps grid used by the sustained benchmark
        assert eng.count_staged(st, reps=2) == 2 * expected
        # per-group fallback agrees (kill switch)
        assert sum(e.count_staged(st) for e in eng.engines) == expected

    def test_fused_kill_switch(self, monkeypatch):
        from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

        monkeypatch.setenv("AMT_FUSED_GROUPS", "0")
        m, hay = self._mid(150)
        eng = GroupedPallasAcEngine(
            m, max_rows=5, n_streams=256, t_tile=64, interpret=True, unroll=4
        )
        assert eng.count(hay) == ac.count_matches(m, hay)
        assert eng._fused is None

    def test_fused_contains(self):
        from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine

        m, hay = self._mid()
        eng = GroupedPallasAcEngine(
            m, max_rows=5, n_streams=256, t_tile=64, interpret=True, unroll=4
        )
        st = eng._stage(hay)
        eng.count_staged(st)  # engage the fused count setup
        assert eng._fused_sticky_setup() is not None
        assert eng.contains_staged(st) is True
        # miss corpus + a needle sitting only in one group's needle set
        st_miss = eng._stage(b"ZQ" * 3000)
        assert eng.contains_staged(st_miss) is False
        last_needle = m.needles[-1]
        st_one = eng._stage(b"ZQ" * 100 + last_needle + b"QZ" * 100)
        assert eng.contains_staged(st_one) is True
        # parity with the per-group path
        assert any(e.contains_staged(st_one) for e in eng.engines) is True


def test_contains_staged_early_segments():
    """Segmented early-exit containsAny (round 5): identical verdicts to
    the one-shot sticky scan at every forced segment count, on hit-first,
    hit-last, and no-hit corpora."""
    import numpy as np

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine

    m = ac.build([(n, i) for i, n in enumerate(["needleword"])])
    eng = PallasAcEngine(m, n_streams=512, t_tile=32, interpret=True)
    base = b"x" * (64 << 10)
    cases = {
        "first": b"needleword" + base,
        "last": base + b"needleword",
        "none": base,
        "mid": base[: 30 << 10] + b"needleword" + base[30 << 10 :],
    }
    for name, corpus in cases.items():
        st = eng.stage(np.frombuffer(corpus, dtype=np.uint8))
        want = eng.contains_staged(st)
        assert want == (b"needleword" in corpus)
        for k in (1, 2, 4):
            got = eng.contains_staged_early(st, n_segments=k)
            assert got == want, (name, k)
    # auto sizing: small corpora collapse to one segment (same code path)
    st = eng.stage(np.frombuffer(cases["mid"], dtype=np.uint8))
    assert eng.contains_staged_early(st) is True
