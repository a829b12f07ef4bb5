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

    def test_packed_roundtrip(self):
        m = ac.build([(b"ab", 0), (b"abc", 1)])
        comp = CompressedMachine.from_machine(m)
        # Decode the packed entries back and compare against delta.
        packed = comp.packed.reshape(-1)
        for s in range(m.n_states):
            for b in range(256):
                idx = s * comp.k + comp.classmap[b]
                v = int(packed[idx])
                assert (v & 0xFFFFF) // comp.k == m.delta[s, b]
                assert (v >> 20) == m.match_count[m.delta[s, b]]


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
