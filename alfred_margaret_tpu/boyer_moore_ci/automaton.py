"""Single-needle case-insensitive Boyer-Moore matching.

Mirrors ``Data.Text.BoyerMooreCI.Automaton`` (``BoyerMooreCI/Automaton.hs``):
the pattern is stored as a code point sequence (expected lowercase — an
uppercase needle never matches, since only the *haystack* is lowered); the
haystack is lowered per code point on the fly; matches are non-overlapping
and reported as **(first byte, last byte)** indices, both inclusive, in raw
haystack coordinates (``BoyerMooreCI/Automaton.hs:119-126``).

Implementation note: the reference iterates the haystack backwards
code-point-wise with byte-level skip tables whose entries account for case
variants of differing UTF-8 lengths (``minimumSkipForCodePoint``,
``BoyerMooreCI/Automaton.hs:244-263``). Our engine instead lowers the
haystack up front with the vectorized transducer (raw-coordinate maps
included) and scans the lowered stream — the non-overlapping leftmost match
set is identical, per the same argument the reference's own test suite uses
(``BoyerMooreCISpec.hs:152-164`` proves BMCI == AC-IgnoreCase-single-needle).
``minimum_skip_for_code_point`` is still provided (and property-tested) as
part of the public surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Tuple

import numpy as np

from ..models.ac import Done, Step
from ..utils import utf8


@dataclass
class Automaton:
    pattern_cps: Tuple[int, ...]  # code points, as given (expected lowercase)
    pattern_bytes: bytes  # utf-8 encoding of pattern_cps
    min_pattern_skip: int

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Automaton) and self.pattern_cps == other.pattern_cps

    def __hash__(self) -> int:
        return hash(self.pattern_cps)

    def __repr__(self) -> str:
        return f"build_automaton({self.pattern_bytes!r})"

    def to_json(self) -> str:
        import json

        return json.dumps(self.pattern_bytes.decode("utf-8"))

    @classmethod
    def from_json(cls, blob: str) -> "Automaton":
        import json

        return build_automaton(json.loads(blob))


def minimum_skip_for_code_point(cp: int) -> int:
    """Safe byte-skip for one pattern code point: the minimum UTF-8 byte
    length over all haystack case variants that lower to it
    (``BoyerMooreCI/Automaton.hs:231-253``; e.g. ⱥ is 3 bytes but its
    unlowering Ⱥ is 2, so the safe skip is 2).
    """
    variants = utf8.unlower_code_point(chr(cp))
    if not variants:
        # Uppercase input: undefined behaviour in the reference, which falls
        # back to the code point's own length.
        return utf8.num_code_units(cp)
    return min(utf8.num_code_units(ord(u)) for u in variants)


def minimum_skip_for_pattern(cps: Tuple[int, ...]) -> int:
    """Byte length of the shortest case variation of the needle
    (``minimumSkipForVector``, ``BoyerMooreCI/Automaton.hs:256-263``)."""
    return sum(minimum_skip_for_code_point(cp) for cp in cps)


def build_automaton(pattern: utf8.TextLike) -> Automaton:
    pattern_bytes = utf8.to_bytes(pattern)
    cps = tuple(ord(c) for c in pattern_bytes.decode("utf-8"))
    return Automaton(
        pattern_cps=cps,
        pattern_bytes=pattern_bytes,
        min_pattern_skip=minimum_skip_for_pattern(cps),
    )


def pattern_length(automaton: Automaton) -> int:
    """Pattern length in UTF-8 code units (bytes)."""
    return len(automaton.pattern_bytes)


def pattern_text(automaton: Automaton) -> bytes:
    return automaton.pattern_bytes


def run_text(
    seed: Any,
    f: Callable[[Any, int, int], Any],
    automaton: Automaton,
    text: utf8.TextLike,
) -> Any:
    """Fold ``f(acc, first_byte, last_byte)`` over non-overlapping matches,
    left to right; both indices inclusive, raw coordinates
    (``runText``, ``BoyerMooreCI/Automaton.hs:121-220``)."""
    if len(automaton.pattern_cps) == 0:
        return seed
    lt = utf8.lower_transform(text)
    lowered = lt.lowered.tobytes()
    pat = automaton.pattern_bytes
    pat_cp_len = len(automaton.pattern_cps)
    start = 0
    while True:
        i = lowered.find(pat, start)
        if i < 0:
            return seed
        # Only accept matches aligned to code point boundaries of the lowered
        # stream that span whole code points (a lowercase pattern always
        # aligns, but an arbitrary byte pattern might not).
        first_cp = int(lt.cp_index[i])
        last_cp = int(lt.cp_index[i + len(pat) - 1])
        if (
            int(lt.cp_index[i - 1]) != first_cp if i > 0 else True
        ) and last_cp - first_cp + 1 == pat_cp_len:
            raw_from = int(lt.raw_start[first_cp])
            raw_to = int(lt.raw_end[last_cp]) - 1
            nxt = f(seed, raw_from, raw_to)
            if isinstance(nxt, Done):
                return nxt.acc
            seed = nxt.acc if isinstance(nxt, Step) else nxt
            start = i + len(pat)  # non-overlapping
        else:
            start = i + 1


def matches(automaton: Automaton, text: utf8.TextLike) -> List[Tuple[int, int]]:
    """All non-overlapping (first_byte, last_byte) matches."""
    out: List[Tuple[int, int]] = []

    def fold(acc, frm, to):
        acc.append((frm, to))
        return Step(acc)

    return run_text(out, fold, automaton, text)


__all__ = [
    "Automaton",
    "build_automaton",
    "minimum_skip_for_code_point",
    "minimum_skip_for_pattern",
    "pattern_length",
    "pattern_text",
    "run_text",
    "matches",
]
