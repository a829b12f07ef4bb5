"""Distributed engine tests on the 8-virtual-device CPU mesh: multi-chip
counts must equal single-chip results for every mesh shape (SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.parallel import DistributedAcEngine, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def machine():
    return ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts", "shorts"])])


CORPUS = b"short tshirts and shorts for all, tshirtshirts galore " * 137


@pytest.mark.parametrize("data,seq", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes_agree(machine, data, seq):
    mesh = make_mesh(jax.devices()[:8], data=data, seq=seq)
    engine = DistributedAcEngine(machine, mesh)
    expected = ac.count_matches(machine, CORPUS)
    assert engine.count(CORPUS) == expected


def test_subset_devices(machine):
    mesh = make_mesh(jax.devices()[:4], data=4, seq=1)
    engine = DistributedAcEngine(machine, mesh)
    assert engine.count(CORPUS) == ac.count_matches(machine, CORPUS)


def test_empty_and_small(machine):
    mesh = make_mesh(jax.devices()[:8], data=4, seq=2)
    engine = DistributedAcEngine(machine, mesh)
    assert engine.count(b"") == 0
    assert engine.count(b"tshirt") == 1


@pytest.mark.parametrize("data,seq,needle", [(4, 1, 2), (2, 2, 2), (1, 2, 4), (2, 1, 4)])
def test_needle_axis_agrees(data, seq, needle):
    rng = np.random.default_rng(9)
    needles = [
        rng.integers(97, 105, size=int(rng.integers(2, 6))).astype(np.uint8).tobytes()
        for _ in range(30)
    ] + [b"dup", b"dup"]  # duplicates must stay in one group
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = rng.integers(97, 105, size=20000).astype(np.uint8).tobytes() + b"dup dup"
    mesh = make_mesh(jax.devices()[: data * seq * needle], data=data, seq=seq, needle=needle)
    engine = DistributedAcEngine(m, mesh)
    assert engine.n_needle_groups == needle
    assert engine.count(hay) == ac.count_matches(m, hay)


@pytest.mark.parametrize("data,seq", [(8, 1), (2, 4)])
def test_positions_identical_across_mesh(machine, data, seq):
    # SURVEY.md §4: position sets must be identical regardless of sharding.
    mesh = make_mesh(jax.devices()[:8], data=data, seq=seq)
    engine = DistributedAcEngine(machine, mesh)
    ends, vids = engine.matches_arrays(CORPUS)
    oracle = ac.all_matches(machine, CORPUS)
    assert [(int(e), int(v)) for e, v in zip(ends, vids)] == [
        (m.pos, m.value) for m in oracle
    ]


def test_searcher_distributed_ignore_case(monkeypatch):
    """Searcher.distributed under IGNORE_CASE scans RAW bytes with the
    composed case DFA: mesh counts equal the local searcher's count."""
    from alfred_margaret_tpu import IGNORE_CASE, Searcher
    from alfred_margaret_tpu.engine import MatchEngine

    monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)
    s = Searcher.build(IGNORE_CASE, ["istanbul", "k", "straße"])
    hay = "İstanbul KELVIN K strAẞE STRASSE straße filler ".encode() * 211
    expected = s.count_matches(hay)
    for data, seq in ((8, 1), (2, 4)):
        mesh = make_mesh(jax.devices()[:8], data=data, seq=seq)
        eng = s.distributed(mesh)
        assert eng.count(hay) == expected
        assert eng.contains_any(hay)


def test_searcher_distributed_case_sensitive(machine):
    from alfred_margaret_tpu import CASE_SENSITIVE, Searcher

    s = Searcher.build(CASE_SENSITIVE, ["tshirt", "shirts", "shorts"])
    mesh = make_mesh(jax.devices()[:8], data=4, seq=2)
    assert s.distributed(mesh).count(CORPUS) == s.count_matches(CORPUS)


def test_searcher_distributed_ignore_case_needle_axis(monkeypatch):
    """Needle-axis partitioning must keep the case-folding composition:
    sub-machines rebuilt case-sensitively would silently drop every
    uppercase match (regression)."""
    from alfred_margaret_tpu import IGNORE_CASE, Searcher
    from alfred_margaret_tpu.engine import MatchEngine

    monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)
    s = Searcher.build(IGNORE_CASE, ["tshirt", "k", "straße"])
    hay = "TShirts KELVIN K strAẞE straße filler ".encode() * 113
    expected = s.count_matches(hay)
    mesh = make_mesh(jax.devices()[:8], data=2, seq=2, needle=2)
    assert s.distributed(mesh).count(hay) == expected


def test_staged_mesh_scans(machine):
    """Mesh staging: one transfer, repeated count_staged calls agree."""
    mesh = make_mesh(jax.devices()[:8], data=4, seq=2)
    eng = DistributedAcEngine(machine, mesh)
    st = eng.stage(CORPUS)
    expected = eng.count(CORPUS)
    assert eng.count_staged(st) == expected
    assert eng.count_staged(st) == expected
    assert eng.count_staged(eng.stage(b"")) == 0


# --- full distributed surface (round-2: positions, presence, staged reuse) --


def _mkset():
    rng = np.random.default_rng(21)
    needles = [
        rng.integers(97, 104, size=int(rng.integers(2, 6))).astype(np.uint8).tobytes()
        for _ in range(24)
    ] + [b"dup", b"dup", b"abc", b"abcd", b"bcd"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = (
        rng.integers(97, 104, size=30000).astype(np.uint8).tobytes()
        + b"dupabcd dup abcd"
    )
    return m, needles, hay


@pytest.mark.parametrize("data,seq,needle", [(8, 1, 1), (2, 2, 2), (1, 2, 4)])
def test_matches_arrays_all_mesh_shapes(data, seq, needle):
    """Position SETS and emission order equal the single-chip oracle on
    every mesh shape, including needle-sharded ones."""
    m, needles, hay = _mkset()
    mesh = make_mesh(jax.devices()[: data * seq * needle], data=data, seq=seq, needle=needle)
    engine = DistributedAcEngine(m, mesh)
    ends, vids = engine.matches_arrays(hay)
    oracle = ac.all_matches(m, hay)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
    )


def test_staged_reuse_across_ops():
    """One staging handle serves count, contains, matches and presence with
    no re-layout."""
    m, needles, hay = _mkset()
    mesh = make_mesh(jax.devices()[:8], data=2, seq=2, needle=2)
    engine = DistributedAcEngine(m, mesh)
    st = engine.stage(hay)
    expected = ac.count_matches(m, hay)
    assert engine.count(st) == expected
    assert engine.contains_any(st) is True
    ends, vids = engine.matches_arrays(st)
    assert len(ends) == expected
    presence = engine.value_presence(st)
    oracle_present = np.zeros(len(m.values), dtype=bool)
    for x in ac.all_matches(m, hay):
        oracle_present[x.value] = True
    assert (presence == oracle_present).all()


def test_contains_all_distributed():
    m, needles, hay = _mkset()
    mesh = make_mesh(jax.devices()[:8], data=4, seq=1, needle=2)
    engine = DistributedAcEngine(m, mesh)
    everything = hay + b" " + b" ".join(needles)
    assert engine.contains_all(everything) is True
    assert engine.contains_all(b"zzzz") is False


def test_contains_any_distributed():
    m, needles, hay = _mkset()
    mesh = make_mesh(jax.devices()[:8], data=2, seq=2, needle=2)
    engine = DistributedAcEngine(m, mesh)
    assert engine.contains_any(hay) is True
    assert engine.contains_any(b"zzzzzz") is False
    assert engine.contains_any(b"") is False


@pytest.mark.parametrize("data,seq,needle", [(2, 1, 2), (2, 2, 1)])
def test_pallas_inner_interpret(data, seq, needle):
    """The TPU per-shard kernels (count, sticky contains, states) under
    shard_map, in interpreter mode on the virtual mesh — the same code path
    real multi-chip runs take."""
    m, needles, hay = _mkset()
    hay = hay[:8000]
    mesh = make_mesh(jax.devices()[: data * seq * needle], data=data, seq=seq, needle=needle)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine.inner == "pallas"
    st = engine.stage(hay)
    assert engine.count(st) == ac.count_matches(m, hay)
    assert engine.contains_any(st) is True
    assert engine.contains_any(b"zz" * 600) is False
    ends, vids = engine.matches_arrays(st)
    oracle = ac.all_matches(m, hay)
    assert len(ends) == len(oracle)
    assert all(int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle))


@pytest.mark.parametrize("data,seq", [(2, 2), (4, 1)])
def test_bitap_inner_interpret(data, seq):
    """Small needle sets route the distributed count/contains steps through
    the bitap register-automaton kernel per shard — counts must stay
    bit-identical to single-chip, and needle-axis-free meshes must engage."""
    rng = np.random.default_rng(21)
    needles = [b"dup", b"dup", b"abc", b"abcd", b"bcd", b"gg"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    hay = (
        rng.integers(97, 104, size=12000).astype(np.uint8).tobytes()
        + b"dupabcd dup abcd"
    )
    mesh = make_mesh(jax.devices()[: data * seq], data=data, seq=seq)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is not None, "bitap inner did not engage"
    st = engine.stage(hay)
    exp = ac.count_matches(m, hay)
    assert engine.count_staged(st) == exp
    assert engine.contains_any(st) == (exp > 0)
    assert engine.contains_any(b"zz" * 600) is False
    # positions through the same handle still use the dense extraction
    ends, vids = engine.matches_arrays_staged(st)
    oracle = ac.all_matches(m, hay)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
    )


def test_bitap_inner_kill_switch(monkeypatch):
    monkeypatch.setenv("AMT_BITAP", "0")
    m = ac.build([(n, i) for i, n in enumerate([b"abc", b"bcd", b"gg"])])
    hay = b"xabcdgg" * 500
    mesh = make_mesh(jax.devices()[:4], data=2, seq=2)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is None
    assert engine.count(hay) == ac.count_matches(m, hay)


def _comb16_set(n_needles: int, n_frags: int):
    rng = np.random.default_rng(17)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(80)
        )
    )[:n_needles]
    needles[:3] = ["abc", "abcd", "c"]  # overlap -> count>=2 states
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    frags = [n.encode() for n in needles[:20]] + [b"zqzqzq", b"abcabcd"]
    hay = b"".join(frags[i] for i in rng.integers(0, len(frags), n_frags))
    return m, hay


@pytest.mark.parametrize("data,seq,needle", [(2, 1, 2), (1, 2, 2)])
def test_comb16_inner_interpret(data, seq, needle):
    """Mid-tier needle groups route the distributed count step through the
    UNIFORM comb16 kernel (per-group SMEM scalars) instead of the dense
    select chain — counts must stay bit-identical to single-chip."""
    m, hay = _comb16_set(70, 250)
    mesh = make_mesh(
        jax.devices()[: data * seq * needle], data=data, seq=seq, needle=needle
    )
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine._c16g is not None, "comb16 inner did not engage"
    assert engine.count(hay) == ac.count_matches(m, hay)
    # staged reuse + the dense-path ops still work on the same handle
    st = engine.stage(hay)
    assert engine.count_staged(st) == ac.count_matches(m, hay)
    assert engine.contains_any(st) is True
    assert engine.contains_any(b"zq" * 500) is False
    # the sticky step also routed through the uniform comb16 kernel
    # (5 table args: classmap/comb/aux/rootseg/gscal; dense has 3)
    ckey = [k for k in engine._count_step if isinstance(k, tuple) and k[0] == "contains"]
    assert ckey and len(engine._count_step[ckey[0]][1]) == 5


def test_comb16_inner_positions_interpret():
    """Position extraction through a comb16-engaged staged handle:
    extraction always runs the full-table per-group kernels (comb16 covers
    count/contains only), so the composition comb16-count + full-table
    positions over one handle must agree with the oracle in full (ends AND
    needle ids, emission order).

    One reduced-size config: interpret-mode per-group extraction over the
    mesh costs ~minutes/KB (it dominated this suite's wall time at 70
    needles x 700 fragments: 2397 s for ONE param — the composition being
    checked is size-independent)."""
    m, hay = _comb16_set(40, 150)
    mesh = make_mesh(jax.devices()[:4], data=1, seq=2, needle=2)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine._c16g is not None, "comb16 inner did not engage"
    st = engine.stage(hay)
    assert engine.count_staged(st) == ac.count_matches(m, hay)
    ends, vids = engine.matches_arrays_staged(st)
    oracle = ac.all_matches(m, hay)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value
        for e, v, o in zip(ends, vids, oracle)
    )


def test_comb16_inner_kill_switch(monkeypatch):
    monkeypatch.setenv("AMT_DIST_COMB16", "0")
    rng = np.random.default_rng(17)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(80)
        )
    )[:70]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    mesh = make_mesh(jax.devices()[:4], data=2, seq=1, needle=2)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    assert engine._c16g is None
    hay = b"".join(n.encode() for n in needles[:30]) * 5
    assert engine.count(hay) == ac.count_matches(m, hay)


def test_bitmap_extraction_nul_needle_padded_streams():
    """Mesh bitmap path with a non-zero-inert machine (NUL needle) and
    fully-padded dead streams: dead-stream pad scans must not inflate the
    kernel counts (they are nulled like the dense count path) and the
    extracted positions must match the oracle exactly."""
    m = ac.build([(b"\x00\x00a", 0), (b"ab", 1)])
    hay = (b"bc\x00\x00add ab " * 12000) + b"ab"  # ~120 KB, several tiles
    mesh = make_mesh(jax.devices()[:4], data=2, seq=2)
    engine = DistributedAcEngine(m, mesh, inner="pallas", interpret=True)
    st = engine.stage(hay)
    oracle = ac.all_matches(m, hay)
    assert engine.count(st) == len(oracle)
    ends, vids = engine.matches_arrays(st)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
    )


def test_empty_needle_not_needle_shardable():
    """The empty needle's root-piggyback count depends on the UNION of all
    shards' non-root states (soak trial 32: per-group sums undercounted
    929 -> 896), so needle-sharded construction must refuse it; data/seq
    meshes scan the full machine and stay exact."""
    from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine
    from alfred_margaret_tpu.ops.pallas_scan import CapacityError

    rng = np.random.default_rng(1032)
    needles = list(
        dict.fromkeys(
            bytes(rng.integers(97, 105, size=rng.integers(1, 9), dtype=np.uint8))
            for _ in range(60)
        )
    )[:50] + [b""]
    m = ac.build([(x, i) for i, x in enumerate(needles)])
    hay = b"".join(needles[i] for i in rng.integers(0, len(needles) - 1, 400))
    expected = ac.count_matches(m, hay)

    with pytest.raises(CapacityError):
        GroupedPallasAcEngine(m, max_rows=5, n_streams=256, t_tile=64, interpret=True)
    with pytest.raises(ValueError):
        DistributedAcEngine(
            m, make_mesh(jax.devices()[:4], data=2, seq=1, needle=2), inner="xla"
        )
    # Data-only mesh: every shard runs the full machine -- exact.
    de = DistributedAcEngine(
        m, make_mesh(jax.devices()[:4], data=4, seq=1, needle=1), inner="xla"
    )
    assert de.count(hay) == expected
    # Auto dispatch must route empty-needle machines to a full-machine
    # engine and stay exact even when a single pass cannot hold the table.
    from alfred_margaret_tpu.engine import MatchEngine
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    eng = MatchEngine(m, engine="auto")
    assert eng.count(hay, CASE_SENSITIVE) == expected


def test_ci_bitap_inner_trapless(monkeypatch):
    """Trapless composed-CI machines (no i/k/å/… letters) ride the bitap
    inner on data/seq meshes; counts equal the scalar IgnoreCase oracle."""
    from alfred_margaret_tpu.models import case_dfa
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    m = ac.build([(n, i) for i, n in enumerate(["dress", "shoe", "glove"])])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    hay = b"DRESS and shoe and GlOvE and dReSs plus filler " * 250
    mesh = make_mesh(jax.devices()[:4], data=2, seq=2)
    engine = DistributedAcEngine(cm, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is not None and engine._bitap_lay.ci
    assert engine._bitap_lay.trap is None
    st = engine.stage(hay)
    exp = ac.count_matches(m, hay, IGNORE_CASE)
    assert engine.count_staged(st) == exp
    assert engine.contains_any(st) == (exp > 0)


def test_ci_bitap_inner_trap_bearing_engages():
    """Trap-bearing CI sets ('i' pulls the İ trap) engage the mesh bitap
    inner too (embedded trap tracks + psum'd trap plane); an İ corpus
    falls back to the dense per-shard step and stays exact."""
    from alfred_margaret_tpu.models import case_dfa
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    m = ac.build([(n, i) for i, n in enumerate(["tshirt", "shirts"])])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    hay = "TSHIRT tshİrt SHIRTS filler ".encode() * 200
    mesh = make_mesh(jax.devices()[:4], data=4, seq=1)
    engine = DistributedAcEngine(cm, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is not None and engine._bitap_lay.has_trap
    assert engine.count(hay) == ac.count_matches(m, hay, IGNORE_CASE)


def test_ci_bitap_inner_trap_fallback_mesh():
    """Trap-bearing composed-CI sets now ride the mesh bitap inner with a
    psum'd sticky trap plane; a Kelvin-K corpus must trigger the lazy
    dense per-shard fallback and stay exact."""
    from alfred_margaret_tpu.models import case_dfa
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    m = ac.build([(n, i) for i, n in enumerate(["kilo", "tshirt"])])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    mesh = make_mesh(jax.devices()[:4], data=2, seq=2)
    engine = DistributedAcEngine(cm, mesh, inner="pallas", interpret=True)
    assert engine._bitap_lay is not None and engine._bitap_lay.has_trap

    clean = b"KILO tshirt kIlO filler " * 150
    exp = ac.count_matches(m, clean, IGNORE_CASE)
    assert engine.count(clean) == exp
    # no trap fired: the dense fallback step must NOT have been built
    assert not any(
        isinstance(k, tuple) and k and k[0] == "dense"
        for k in (engine._count_step or {})
    )

    kelvin = ("xyz \u212aILO abc " * 60).encode()  # Kelvin sign K
    exp2 = ac.count_matches(m, kelvin, IGNORE_CASE)
    assert exp2 == 60
    assert engine.count(kelvin) == exp2
    # the trap drove the lazy dense step into existence
    assert any(
        isinstance(k, tuple) and k and k[0] == "dense"
        for k in engine._count_step
    )
    assert engine.contains_any(kelvin) is True
    assert engine.contains_any(b"zz" * 400) is False
