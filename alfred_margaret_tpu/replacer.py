"""Priority-ordered sequential multi-needle replacement.

Mirrors ``Data.Text.AhoCorasick.Replacer`` (``Replacer.hs``) bit-for-bit:
the semantics of applying ``Text.replace`` per needle in build order, but in
O(passes * n): repeated scans where each pass keeps only the matches of the
highest not-yet-done priority, removes overlaps leftmost-first, splices the
replacements, and lowers the priority threshold — replacements can create
new matches for *lower* priorities only (``Replacer.hs:203-274``).

The scan itself runs on whichever engine the searcher picked (the
control-flow-heavy pass loop is host-driven; each pass is one device scan).
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dc_replace
from typing import Any, Callable, Iterable, List, Optional, Tuple

import numpy as np

from .models import ac
from .searcher import Searcher
from .utils import utf8
from .utils.case import IGNORE_CASE, CaseSensitivity

MAX_BOUND = 2**63 - 1


@dataclass(frozen=True)
class Payload:
    """Per-needle metadata (``Replacer.hs:59-70``).

    needle_priority:   higher replaces first; build assigns -index so earlier
                       needles win (``Replacer.hs:97-116``)
    needle_length_bytes: byte length of the *original* needle (CaseSensitive
                       match length)
    needle_length_code_points: code point length (IgnoreCase match length —
                       byte lengths may differ under case folding, code point
                       counts cannot)
    needle_replacement: replacement bytes
    """

    needle_priority: int
    needle_length_bytes: int
    needle_length_code_points: int
    needle_replacement: bytes

    def _astuple(self):
        return (
            self.needle_priority,
            self.needle_length_bytes,
            self.needle_length_code_points,
            self.needle_replacement,
        )


class Replacer:
    def __init__(self, searcher: Searcher):
        self.searcher = searcher

    @classmethod
    def build(
        cls,
        case: CaseSensitivity,
        replaces: Iterable[Tuple[utf8.TextLike, utf8.TextLike]],
        engine: str = "auto",
    ) -> "Replacer":
        """Build from (needle, replacement) pairs; under IGNORE_CASE needles
        are lowercased here (``Replacer.hs:97-116``)."""
        pairs = []
        for i, (needle, replacement) in enumerate(replaces):
            nb = utf8.to_bytes(needle)
            ns = nb.decode("utf-8")
            stored = utf8.lower_str(ns).encode("utf-8") if case is IGNORE_CASE else nb
            payload = Payload(
                needle_priority=-i,
                needle_length_bytes=len(nb),
                needle_length_code_points=len(ns),
                needle_replacement=utf8.to_bytes(replacement),
            )
            pairs.append((stored, payload))
        return cls(Searcher.build_with_values(case, pairs, engine=engine))

    # -- wrappers ----------------------------------------------------------

    @property
    def case_sensitivity(self) -> CaseSensitivity:
        return self.searcher.case_sensitivity

    def compose(self, other: "Replacer") -> Optional["Replacer"]:
        """``other`` after ``self`` (``compose``, ``Replacer.hs:120-133``);
        None if case sensitivities differ."""
        if self.case_sensitivity != other.case_sensitivity:
            return None
        combined = self.searcher.needles + other.searcher.needles
        renumbered = [
            (needle, dc_replace(payload, needle_priority=-i))
            for i, (needle, payload) in enumerate(combined)
        ]
        return Replacer(
            Searcher.build_with_values(
                self.case_sensitivity, renumbered, engine=self.searcher._engine_name
            )
        )

    def map_replacement(self, f: Callable[[bytes], bytes]) -> "Replacer":
        """Modify replacements without touching needles (``Replacer.hs:136-144``)."""
        return Replacer(
            self.searcher.map_searcher(
                lambda p: dc_replace(p, needle_replacement=f(p.needle_replacement))
            )
        )

    def set_case_sensitivity(self, case: CaseSensitivity) -> "Replacer":
        return Replacer(self.searcher.set_case_sensitivity(case))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Replacer) and self.searcher == other.searcher

    def __hash__(self) -> int:
        return hash(self.searcher)

    # -- serialization -----------------------------------------------------
    # The reference derives FromJSON/ToJSON generically on the Replacer
    # record (Replacer.hs:72,83): the stored searcher needles plus their
    # payloads round-trip, and the automaton is rebuilt on parse.

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "caseSensitivity": self.case_sensitivity.to_json(),
                "needles": [
                    [
                        needle.decode("utf-8"),
                        payload.needle_priority,
                        payload.needle_length_bytes,
                        payload.needle_length_code_points,
                        payload.needle_replacement.decode("utf-8"),
                    ]
                    for needle, payload in self.searcher.needles
                ],
            }
        )

    @classmethod
    def from_json(cls, blob: str, engine: str = "auto") -> "Replacer":
        import json

        obj = json.loads(blob)
        case = CaseSensitivity.from_json(obj["caseSensitivity"])
        pairs = [
            (
                needle.encode("utf-8"),
                Payload(prio, len_b, len_cp, repl.encode("utf-8")),
            )
            for needle, prio, len_b, len_cp, repl in obj["needles"]
        ]
        return cls(Searcher.build_with_values(case, pairs, engine=engine))

    # -- running -----------------------------------------------------------

    def run(self, haystack: utf8.TextLike) -> Any:
        result = self.run_with_limit(haystack, MAX_BOUND)
        assert result is not None
        return result

    def run_with_limit(self, haystack: utf8.TextLike, max_length: int) -> Optional[Any]:
        """Replace everything unless the intermediate result would exceed
        ``max_length`` bytes (``runWithLimit``, ``Replacer.hs:203-274``).

        Returns the same type as the input (str in, str out).
        """
        as_str = isinstance(haystack, str)
        data = utf8.to_bytes(haystack)
        searcher = self.searcher
        machine = searcher.automaton
        case = searcher.case_sensitivity
        num_needles = searcher.num_needles
        min_priority = 1 - num_needles
        threshold = 1  # priorities are <= 0, so 1 keeps all matches

        while True:
            ms = searcher._engine.matches(data, case)
            best, length_delta = self._select_pass(ms, machine, threshold, data)
            if best is None:
                result = data
                break
            p, payload, match_starts, match_ends = best
            if len(data) + length_delta > max_length:
                return None
            new_data = _splice(data, match_starts, match_ends, payload.needle_replacement)
            if p == min_priority:
                result = new_data
                break
            data = new_data
            threshold = p

        return result.decode("utf-8") if as_str else result

    def _select_pass(self, ms, machine, threshold: int, data: bytes):
        """Pick the matches of the best priority below ``threshold``.

        Returns (``(priority, payload, starts, ends)`` or None,
        total byte delta over *all* matches of that priority including
        overlapping ones — the reference computes its maxLength estimate
        before overlap removal (``Replacer.hs:232-240``)).
        """
        if len(ms) == 0:
            return None, 0
        values = machine.values
        prios = np.fromiter(
            (values[v].needle_priority for v in ms.value_ids), np.int64, len(ms.value_ids)
        )
        keep = prios < threshold
        if not keep.any():
            return None, 0
        p = int(prios[keep].max())
        sel = prios == p
        ends = ms.ends[sel]
        # All selected matches are the same needle (priorities are unique).
        payload: Payload = values[int(ms.value_ids[np.flatnonzero(sel)[0]])]
        if self.case_sensitivity is IGNORE_CASE:
            lt = ms.lowered
            lenc = payload.needle_length_code_points
            if lt is None:
                # Composed case-DFA path: ends are native raw coordinates,
                # recover starts by backward code-point skipping on the raw
                # text (makeMatch, Replacer.hs:264-274).
                starts = utf8.raw_match_starts(data, ends, lenc)
            else:
                end_cp = lt.cp_of_raw_end(ends)
                starts = lt.raw_start_of_cp(end_cp - (lenc - 1))
        else:
            starts = ends - payload.needle_length_bytes
        # Engine emission order is ascending end = ascending start here (all
        # matches are the same needle).
        # removeOverlap: keep matches that start at/after the previous kept end
        # (Replacer.hs:191-198), leftmost-wins within the pass.
        kept_starts: List[int] = []
        kept_ends: List[int] = []
        prev_end = -1
        for s, e in zip(starts, ends):
            if s >= prev_end:
                kept_starts.append(int(s))
                kept_ends.append(int(e))
                prev_end = int(e)
        # maxLength estimate over ALL matches of this priority (pre-dedup).
        repl_len = len(payload.needle_replacement)
        delta = int(np.sum(repl_len - (ends - starts)))
        return (
            (p, payload, np.asarray(kept_starts, dtype=np.int64), np.asarray(kept_ends, dtype=np.int64)),
            delta,
        )


def _splice(data: bytes, starts: np.ndarray, ends: np.ndarray, replacement: bytes) -> bytes:
    """Replace non-overlapping [start, end) ranges (``replace``,
    ``Replacer.hs:163-180``): slices plus one final concatenation."""
    parts: List[bytes] = []
    prev = 0
    for s, e in zip(starts, ends):
        parts.append(data[prev:s])
        parts.append(replacement)
        prev = e
    parts.append(data[prev:])
    return b"".join(parts)


__all__ = ["Replacer", "Payload", "MAX_BOUND"]
