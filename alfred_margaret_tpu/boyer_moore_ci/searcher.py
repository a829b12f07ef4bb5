"""Multi-needle facade over independent case-insensitive Boyer-Moore
automata, mirroring ``Data.Text.BoyerMooreCI.Searcher``
(``BoyerMooreCI/Searcher.hs:50-121``). Needles must be lowercase. Large
haystacks route through the AC IgnoreCase engine (one pass for all needles).
"""

from __future__ import annotations

from typing import Any, Iterable, List, Tuple

from ..utils import utf8
from ..utils.case import IGNORE_CASE
from . import automaton as bmci

#: Above this many haystack bytes, existence queries use the AC engine.
AC_ROUTE_THRESHOLD = 1 << 16


class Searcher:
    def __init__(self, needles_with_values: List[Tuple[bytes, Any]], engine: str = "auto"):
        self._needles = needles_with_values
        self._automata = [(bmci.build_automaton(n), v) for n, v in needles_with_values]
        self._engine_name = engine
        self._ac = None

    @classmethod
    def build(cls, needles: Iterable[utf8.TextLike], engine: str = "auto") -> "Searcher":
        return cls([(utf8.to_bytes(n), ()) for n in needles], engine=engine)

    @classmethod
    def build_with_values(
        cls, needles_with_values: Iterable[Tuple[utf8.TextLike, Any]], engine: str = "auto"
    ) -> "Searcher":
        return cls([(utf8.to_bytes(n), v) for n, v in needles_with_values], engine=engine)

    @classmethod
    def build_needle_id_searcher(cls, needles: Iterable[utf8.TextLike], engine: str = "auto") -> "Searcher":
        return cls([(utf8.to_bytes(n), i) for i, n in enumerate(needles)], engine=engine)

    @property
    def needles(self) -> List[Tuple[bytes, Any]]:
        return list(self._needles)

    @property
    def num_needles(self) -> int:
        return len(self._needles)

    @property
    def automata(self) -> List[Tuple[bmci.Automaton, Any]]:
        return list(self._automata)

    def _key(self):
        return tuple((n, v) for n, v in self._needles)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Searcher) and self._key() == other._key()

    def __hash__(self) -> int:
        return hash(self._key())

    def _ac_searcher(self):
        if self._ac is None:
            from ..searcher import Searcher as AcSearcher

            self._ac = AcSearcher.build_needle_id_searcher(
                IGNORE_CASE, [n for n, _ in self._needles], engine=self._engine_name
            )
        return self._ac

    def contains_any(self, haystack: utf8.TextLike) -> bool:
        """Any needle occurs case-insensitively (``BoyerMooreCI/Searcher.hs:98-105``).
        Empty needles never match."""
        data = utf8.to_bytes(haystack)
        if len(data) > AC_ROUTE_THRESHOLD and self.num_needles >= 1:
            # Also for a single needle: the AC route scans raw bytes with
            # the composed case DFA, skipping the lowering pass entirely.
            return self._ac_searcher().contains_any(data)
        lowered = utf8.lower_transform(data).lowered.tobytes()
        return any(
            len(a.pattern_bytes) > 0 and lowered.find(a.pattern_bytes) >= 0
            for a, _ in self._automata
        )

    def contains_all(self, haystack: utf8.TextLike) -> bool:
        data = utf8.to_bytes(haystack)
        if len(data) > AC_ROUTE_THRESHOLD and self.num_needles >= 1:
            return self._ac_searcher().contains_all(data)
        lowered = utf8.lower_transform(data).lowered.tobytes()
        return all(
            len(a.pattern_bytes) > 0 and lowered.find(a.pattern_bytes) >= 0
            for a, _ in self._automata
        )


__all__ = ["Searcher"]
