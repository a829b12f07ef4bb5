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
