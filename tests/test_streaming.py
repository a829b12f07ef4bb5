"""Out-of-core streaming scans: chunked staging with exact chunk-boundary
handling (prefix overlap + host-side prefix subtraction)."""

import numpy as np
import pytest

from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.bench.dataformat import synth_corpus
from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.streaming import StreamingScanner


@pytest.fixture(scope="module")
def setup():
    needles = ["tshirt", "shirts", "shorts", "ort", "t"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 1 << 19, hit_fraction=0.01, seed=4)
    eng = PallasAcEngine(m, n_streams=512, t_tile=64, interpret=True)
    return m, needles, corpus, eng


@pytest.mark.parametrize("chunk_kb", [64, 96, 517])  # non-dividing sizes too
def test_streaming_count_exact(setup, chunk_kb):
    m, needles, corpus, eng = setup
    sc = StreamingScanner(eng, m, chunk_bytes=chunk_kb << 10)
    data = np.frombuffer(corpus, dtype=np.uint8)
    assert sc.count(data) == ac.count_matches(m, corpus)


def test_streaming_boundary_straddles(setup):
    """Matches exactly straddling every chunk boundary are neither lost nor
    double counted."""
    m, needles, corpus, eng = setup
    chunk = 4096
    buf = bytearray(b"z" * 5 * chunk)
    for i in range(1, 5):
        b = i * chunk
        buf[b - 3 : b + 3] = b"tshirt"  # straddles the boundary
        buf[b - 7 : b - 1] = b"shorts"  # ends 1 before the boundary
    data = bytes(buf)
    sc = StreamingScanner(eng, m, chunk_bytes=chunk)
    assert sc.count(np.frombuffer(data, dtype=np.uint8)) == ac.count_matches(m, data)


def test_streaming_matches_and_contains(setup):
    m, needles, corpus, eng = setup
    sc = StreamingScanner(eng, m, chunk_bytes=96 << 10)
    data = np.frombuffer(corpus, dtype=np.uint8)
    ends, vids = sc.matches_arrays(data)
    oracle = ac.all_matches(m, corpus)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value
        for e, v, o in zip(ends[:4000], vids[:4000], oracle[:4000])
    )
    assert sc.contains(data) is True
    assert sc.contains(np.frombuffer(b"z" * 300000, dtype=np.uint8)) is False


def test_streaming_comb16(setup):
    rng = np.random.default_rng(7)
    needles = list(
        dict.fromkeys(
            "".join(chr(97 + c) for c in rng.integers(0, 26, size=rng.integers(4, 9)))
            for _ in range(110)
        )
    )[:100]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 3 << 17, hit_fraction=0.01, seed=5)
    eng = Comb16PallasAcEngine(m, n_streams=512, t_tile=64, interpret=True)
    sc = StreamingScanner(eng, m, chunk_bytes=1 << 17)
    assert sc.count(np.frombuffer(corpus, dtype=np.uint8)) == ac.count_matches(m, corpus)


def test_streaming_memmap(tmp_path, setup):
    """np.memmap source: the 10 GB-corpus access pattern, nothing fully
    resident host-side either."""
    m, needles, corpus, eng = setup
    path = tmp_path / "corpus.bin"
    path.write_bytes(corpus)
    mm = np.memmap(str(path), dtype=np.uint8, mode="r")
    sc = StreamingScanner(eng, m, chunk_bytes=128 << 10)
    assert sc.count(mm) == ac.count_matches(m, corpus)


def test_streaming_over_mesh(tmp_path):
    """Out-of-core corpus feeding the WHOLE 8-virtual-device mesh: the
    StreamingScanner composes with DistributedAcEngine (stage /
    count_staged / contains_staged / matches_arrays_staged), so a 10 GB
    memmap streams through chunk-by-chunk with every chunk scanned by the
    full mesh and results bit-identical to single-chip."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from alfred_margaret_tpu.parallel import DistributedAcEngine, make_mesh

    needles = ["tshirt", "shirts", "shorts", "ort", "t"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 3 << 17, hit_fraction=0.01, seed=11)
    path = tmp_path / "corpus.bin"
    path.write_bytes(corpus)
    mm = np.memmap(str(path), dtype=np.uint8, mode="r")

    mesh = make_mesh(jax.devices()[:8], data=4, seq=2)
    dist = DistributedAcEngine(m, mesh)
    sc = StreamingScanner(dist, m, chunk_bytes=1 << 17)  # 3 chunks
    assert sc.count(mm) == ac.count_matches(m, corpus)
    assert sc.contains(mm) is True
    assert sc.contains(np.frombuffer(b"z" * 100000, dtype=np.uint8)) is False
    ends, vids = sc.matches_arrays(mm)
    oracle = ac.all_matches(m, corpus)
    assert len(ends) == len(oracle)
    assert all(
        int(e) == o.pos and int(v) == o.value
        for e, v, o in zip(ends[:2000], vids[:2000], oracle[:2000])
    )


def test_stage_over_budget_skips_device_residency(monkeypatch):
    """A corpus past the out-of-core budget must not be one-shot staged into
    HBM by Searcher.stage / MatchEngine.stage: the handle keeps the host
    bytes (lowering amortized) and scans route through the chunked
    streaming path instead of a whole-corpus device upload."""
    from alfred_margaret_tpu.engine import MatchEngine
    from alfred_margaret_tpu.utils import config
    from alfred_margaret_tpu.utils.case import CASE_SENSITIVE

    needles = ["tshirt", "shirts", "shorts"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    corpus = synth_corpus(needles, 3 << 20, hit_fraction=0.01, seed=13)

    import dataclasses

    monkeypatch.setattr(  # budget: 2 MiB (EngineConfig is frozen)
        config, "DEFAULT", dataclasses.replace(config.DEFAULT, stream_chunk_mb=1)
    )
    eng = MatchEngine(m, engine="pallas")
    staged = eng.stage(corpus, CASE_SENSITIVE)
    assert staged.device is None  # not HBM-resident
    # The same handle still scans correctly end-to-end (auto engine picks a
    # host path on the CPU backend; on TPU it would stream chunk-by-chunk).
    auto = MatchEngine(m)
    assert auto.count(staged, CASE_SENSITIVE) == ac.count_matches(m, corpus)
