"""Independent Aho-Corasick conformance oracle (runtime failure-link NFA).

Every other engine in this package executes tables produced by one builder
(``models.ac.build``: trie -> BFS failure links -> dense DFA-ization with
flattened outputs).  A builder bug would therefore pass every existing
parity gate — the C++ engine, the XLA scan and the Pallas kernels all run
the same arrays.  The reference project guards against exactly this with
cross-IMPLEMENTATION count checks against BurntSushi's Rust and hankcs's
Java automata (``/root/reference/benchmark/benchmark.py:65-69``,
``benchmark/rust/src/main.rs:62-84``, ``benchmark/java/main.java:66-84``).

This module is the analogous in-tree independent implementation: a textbook
Aho-Corasick NFA that shares NO code or arrays with ``models.ac`` —

* its own byte trie (dicts, not IntMaps or numpy),
* its own failure-link BFS,
* **runtime** failure-link transitions (goto miss => follow fail links until
  a goto exists or root; no DFA-ization), and
* **runtime** output collection by walking the suffix-link chain at every
  node (no flattened output sets).

Emission semantics mirror the reference contract
(``src/Data/Text/AhoCorasick/Automaton.hs:367-380``): at each end position,
the entered node's own needles first (longest), then suffix-chain needles in
decreasing length; duplicate needles emit their payloads in insertion order
(``Automaton.hs:259-263``).

It is scalar Python (~1-3 MB/s) — use it on slices, as
``bench/configs.py`` does for its conformance gates.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, List, Sequence, Tuple

from ..utils import utf8


class NfaOracle:
    """Textbook Aho-Corasick NFA over bytes with runtime failure links."""

    def __init__(self, needles: Iterable[utf8.TextLike]):
        needles = [utf8.to_bytes(n) for n in needles]
        self.needles = needles
        # Trie: per node a dict byte -> node id; outputs = needle ids ending
        # exactly at this node (insertion order => payload merge order).
        self._goto: List[dict] = [{}]
        self._out: List[List[int]] = [[]]
        for vid, needle in enumerate(needles):
            if len(needle) == 0:
                # Empty needle: the reference's build drops it from the trie
                # (it can never match; BoyerMooreSpec documents "no match"
                # for the empty needle as well).
                continue
            node = 0
            for b in needle:
                nxt = self._goto[node].get(b)
                if nxt is None:
                    nxt = len(self._goto)
                    self._goto[node][b] = nxt
                    self._goto.append({})
                    self._out.append([])
                node = nxt
            self._out[node].append(vid)
        # Failure links: classic BFS (child fail = follow parent's fail
        # chain until a goto on the edge byte exists, else root).
        self._fail = [0] * len(self._goto)
        q = deque()
        for b, child in self._goto[0].items():
            q.append(child)
        while q:
            node = q.popleft()
            for b, child in self._goto[node].items():
                f = self._fail[node]
                while f and b not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(b, 0)
                if self._fail[child] == child:  # depth-1 nodes fail to root
                    self._fail[child] = 0
                q.append(child)

    def _step(self, node: int, b: int) -> int:
        """Runtime NFA transition: goto else follow failure links."""
        while True:
            nxt = self._goto[node].get(b)
            if nxt is not None:
                return nxt
            if node == 0:
                return 0
            node = self._fail[node]

    def _emit(self, node: int) -> List[int]:
        """Runtime output collection along the suffix-link chain."""
        out: List[int] = []
        n = node
        while n:
            out.extend(self._out[n])
            n = self._fail[n]
        return out

    def count(self, haystack: utf8.TextLike) -> int:
        data = utf8.to_bytes(haystack)
        node, total = 0, 0
        for b in data:
            node = self._step(node, b)
            n = node
            while n:
                total += len(self._out[n])
                n = self._fail[n]
        return total

    def all_matches(self, haystack: utf8.TextLike) -> List[Tuple[int, int]]:
        """[(end position one past the match, needle id)] in reference
        emission order."""
        data = utf8.to_bytes(haystack)
        node = 0
        out: List[Tuple[int, int]] = []
        for i, b in enumerate(data):
            node = self._step(node, b)
            for vid in self._emit(node):
                out.append((i + 1, vid))
        return out

    def contains_any(self, haystack: utf8.TextLike) -> bool:
        data = utf8.to_bytes(haystack)
        node = 0
        for b in data:
            node = self._step(node, b)
            n = node
            while n:
                if self._out[n]:
                    return True
                n = self._fail[n]
        return False


def cross_check_counts(
    needles: Sequence[utf8.TextLike], haystack: utf8.TextLike, observed: int
) -> None:
    """Assert the independent NFA count equals an engine's count (the
    reference driver's counts-on-stderr conformance protocol, applied
    in-process)."""
    want = NfaOracle(needles).count(haystack)
    if want != observed:
        raise AssertionError(
            f"conformance violation: independent NFA counts {want}, engine "
            f"reported {observed}"
        )


__all__ = ["NfaOracle", "cross_check_counts"]
