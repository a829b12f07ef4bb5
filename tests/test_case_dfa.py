"""Composed case-folding DFA tests (``models.case_dfa``).

The contract: scanning the composed machine CaseSensitively over the RAW
haystack must produce exactly the matches (values, counts, raw end
positions) of lowering the haystack with the strict streaming transducer
and scanning the lowered bytes with the plain machine — i.e. the engine's
IgnoreCase fallback path.  These tests pin that equivalence on the
reference's Unicode traps (İ, ẞ/ß, Å aliases, K Kelvin, ǳ digraphs, emoji;
``tests/Data/Text/AhoCorasickSpec.hs:120-135``), on malformed byte soup,
and at the Searcher/Replacer/Splitter level with composition forced on.
"""

import random

import numpy as np
import pytest

from alfred_margaret_tpu import IGNORE_CASE, Replacer, Searcher, Splitter
from alfred_margaret_tpu.engine import MatchEngine
from alfred_margaret_tpu.models import ac, case_dfa
from alfred_margaret_tpu.utils import utf8


def scalar_scan(machine, data):
    """(ends, value_ids) of a scalar case-sensitive byte scan."""
    ends, vids = [], []
    state = 0
    for i, b in enumerate(data):
        state = machine.delta[state, b]
        for v in machine.outputs(int(state)):
            ends.append(i + 1)
            vids.append(int(v))
    return ends, vids


def oracle_scan(pairs, data):
    """The lowered-scan oracle: ends in raw coordinates + value ids."""
    M = ac.build(pairs)
    lt = utf8.lower_transform(data)
    ends, vids = scalar_scan(M, bytes(lt.lowered))
    if ends:
        ends = [int(e) for e in lt.map_ends_to_raw(np.asarray(ends, dtype=np.int64))]
    return ends, vids


def assert_composed_matches_oracle(needles, haystack):
    pairs = [(n.encode() if isinstance(n, str) else n, i) for i, n in enumerate(needles)]
    data = haystack.encode() if isinstance(haystack, str) else haystack
    C = case_dfa.compose_build(pairs)
    assert scalar_scan(C, data) == oracle_scan(pairs, data)


class TestComposedGoldens:
    def test_readme_needles(self):
        assert_composed_matches_oracle(
            ["tshirt", "shirts", "shorts"], "TSHIRTS and SHORTS galore tshirt"
        )

    def test_unicode_specials(self):
        # İ (2B->1B), K Kelvin (3B->1B), Å alias, ẞ/ß, ǳ digraph casings.
        assert_composed_matches_oracle(
            ["istanbul", "k", "straße", "ǳungle"],
            "İstanbul K KELVIN strAẞE STRASSE straße Ǳungle ǲungle ǳungle",
        )

    def test_emoji_and_astral(self):
        assert_composed_matches_oracle(["a💩b", "𝄞"], "A💩B x 𝄞 a💩b")

    def test_malformed_soup(self):
        data = b"ab\x80cd\xc3stra\xc3\x9fe\xe2\x82ss\xff\xf0a"
        assert_composed_matches_oracle(["straße", "ss", "a"], data)

    def test_uppercase_needle_never_matches(self):
        # runLower contract (Automaton.hs:551-553): non-lowercase needles
        # cannot match a lowered stream.
        assert_composed_matches_oracle(["K", "Straße"], "k K straße STRASSE")

    def test_match_counts_per_state_survive(self):
        pairs = [(b"ab", 0), (b"b", 1), (b"abab", 2)]
        C = case_dfa.compose_build(pairs)
        ends, vids = scalar_scan(C, b"ABAB")
        assert ends == [2, 2, 4, 4, 4]
        assert vids == [0, 1, 2, 0, 1]

    def test_ineligible_needles_raise(self):
        with pytest.raises(ValueError):
            case_dfa.compose_build([(b"\xc3", 0)])
        assert not case_dfa.eligible([b"\x80ab"])
        assert case_dfa.eligible([b"stra\xc3\x9fe", b"k"])


class TestComposedFuzz:
    def test_fuzz_vs_oracle(self):
        rng = random.Random(20260817)
        alphabets = ["abAB12", "авгАВГkKÅå", "aAıİßẞǳǱok", "a💩𝄞ßẞ"]
        for trial in range(25):
            alpha = rng.choice(alphabets)
            frags = [
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 4)))
                for _ in range(8)
            ]
            needles = list(
                {
                    utf8.lower_str("".join(rng.sample(frags, rng.randint(1, 3))))
                    for _ in range(rng.randint(1, 6))
                }
            )
            hay = "".join(rng.choice(frags) for _ in range(50)).encode()
            if trial % 3 == 0:
                hb = bytearray(hay)
                for _ in range(4):
                    hb[rng.randrange(len(hb))] = rng.choice([0x80, 0xC3, 0xE2, 0xFF, 0xF0])
                hay = bytes(hb)
            assert_composed_matches_oracle(needles, hay)


class TestRawMatchStarts:
    def test_vector_matches_scalar_skip(self):
        text = "xxKAVAK straße 💩ab".encode()
        # Matches of needle 'kavak' (5 cps) and 'straße' (6 cps) recovered.
        ends = np.array([7], dtype=np.int64)
        assert list(utf8.raw_match_starts(text, ends, 5)) == [2]
        e2 = np.array([len("xxKAVAK straße".encode())], dtype=np.int64)
        assert list(utf8.raw_match_starts(text, e2, 6)) == [8]

    def test_junk_before_match_is_ignored(self):
        text = b"\x80\xffAB"
        assert list(utf8.raw_match_starts(text, np.array([4]), 2)) == [2]

    def test_zero_length(self):
        assert list(utf8.raw_match_starts(b"ab", np.array([1]), 0)) == [1]


def _forced(monkeypatch):
    """Make every IgnoreCase op build the composed machine immediately."""
    monkeypatch.setattr(MatchEngine, "AUTO_COMPOSE_BYTES", 0)


class TestEngineIntegration:
    def test_searcher_ops_match_fallback(self, monkeypatch):
        needles = ["istanbul", "k", "straße", "tshirt"]
        hay = "İstanbul KELVIN tshirts heiße STRASSE straße ab" * 3
        plain = Searcher.build_needle_id_searcher(IGNORE_CASE, needles, engine="python")
        _forced(monkeypatch)
        comp = Searcher.build_needle_id_searcher(IGNORE_CASE, needles, engine="python")
        assert comp._engine._composed(IGNORE_CASE, hay.encode()) is not None
        assert comp.count_matches(hay) == plain.count_matches(hay)
        assert comp.contains_any(hay) == plain.contains_any(hay)
        assert comp.contains_all(hay) == plain.contains_all(hay)
        assert comp.all_matches(hay) == plain.all_matches(hay)

    def test_replacer_matches_fallback(self, monkeypatch):
        replaces = [("straße", "st"), ("k", "KAY"), ("ǳ", "dz!")]
        hay = "STRASSE K straße Ǳ ǲ ǳ KELVIN heiße"
        plain = Replacer.build(IGNORE_CASE, replaces, engine="python").run(hay)
        _forced(monkeypatch)
        got = Replacer.build(IGNORE_CASE, replaces, engine="python").run(hay)
        assert got == plain

    def test_splitter_matches_fallback(self, monkeypatch):
        sp = Splitter.build("ß", engine="python")
        hay = "aẞbßc ẞẞ d"
        plain = sp.split_ignore_case(hay)
        _forced(monkeypatch)
        sp2 = Splitter.build("ß", engine="python")
        assert sp2.split_ignore_case(hay) == plain

    def test_staged_haystack_composed(self, monkeypatch):
        _forced(monkeypatch)
        s = Searcher.build(IGNORE_CASE, ["kavak", "straße"], engine="python")
        hay = "KAVAK and STRASSE and straße"
        st = s.stage(hay)
        assert st.composed
        assert s.count_matches(st) == s.count_matches(hay)
        assert s.contains_any(st)

    def test_small_inputs_skip_composition(self):
        s = Searcher.build(IGNORE_CASE, ["abc"], engine="python")
        assert s.count_matches("ABC abc") == 2
        # The composed engine was not built for a tiny one-shot input.
        assert s._engine._ci is False


class TestStagedOwnership:
    def test_composed_staged_rejected_by_other_searcher(self, monkeypatch):
        """A composed staged haystack must not be scanned by a different
        searcher (its raw bytes would be treated as lowered bytes)."""
        _forced(monkeypatch)
        s1 = Searcher.build(IGNORE_CASE, ["kavak", "k"], engine="python")
        st = s1.stage("KAVAK and kavak K")
        s2 = Searcher.build(IGNORE_CASE, ["kavak", "k"], engine="python")
        with pytest.raises(ValueError):
            s2.count_matches(st)
        # The owner still accepts it.
        assert s1.count_matches(st) == s1.count_matches("KAVAK and kavak K")


class TestComposedHypothesis:
    """Hypothesis property: the composed machine's scalar scan equals the
    lowered-scan oracle on fragment-pool inputs (the reference's generator
    strategy, ``TestInstances.hs:36-56``)."""

    @staticmethod
    def _strategy():
        from hypothesis import strategies as st

        alphabets = ["abAB12", "aAБВ\U0001d11e\U0001f4a9ßẞÅÅå", "kKıİǳǱθϴ"]

        @st.composite
        def needle_haystack(draw):
            alphabet = draw(st.sampled_from(alphabets))
            fragments = draw(
                st.lists(
                    st.text(alphabet=alphabet, min_size=1, max_size=3),
                    min_size=1,
                    max_size=5,
                )
            )
            frag = st.sampled_from(fragments)
            needles = draw(
                st.lists(
                    st.builds("".join, st.lists(frag, min_size=1, max_size=2)),
                    min_size=0,
                    max_size=4,
                )
            )
            haystack = draw(st.builds("".join, st.lists(frag, min_size=0, max_size=25)))
            return needles, haystack

        return needle_haystack()

    def test_property_vs_oracle(self):
        from hypothesis import given, settings

        @given(self._strategy())
        @settings(max_examples=120, deadline=None)
        def check(nh):
            needles, haystack = nh
            lowered = list({utf8.lower_str(n) for n in needles})
            assert_composed_matches_oracle(lowered, haystack)

        check()
