"""Aho-Corasick Searcher: needle set + automaton + engine.

High-level API mirroring the reference's
``Data.Text.AhoCorasick.Searcher`` (``Searcher.hs:14-27``): a searcher pairs
a needle list (with values) and the automaton built from it, with equality /
hashing / serialization defined **by the needle list only** — the automaton
is a deterministic function of it and is rebuilt on deserialize
(``Searcher.hs:47-77``).

Note (as in the reference): when ``IGNORE_CASE`` is used the caller is
responsible for providing lowercase needles — uppercase needles will never
match (``Searcher.hs:108-118``).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .engine import MatchEngine
from .models import ac
from .utils import utf8
from .utils.case import CASE_SENSITIVE, IGNORE_CASE, CaseSensitivity


class Searcher:
    """A set of needles with associated values and a matching engine.

    INVARIANT: the automaton is always ``ac.build(needles)`` — enforced by
    construction; all mutating operations rebuild or share it.
    """

    def __init__(
        self,
        case: CaseSensitivity,
        needles_with_values: Sequence[Tuple[bytes, Any]],
        machine: Optional[ac.AcMachine] = None,
        engine: str = "auto",
    ):
        self._case = case
        self._needles: List[Tuple[bytes, Any]] = [
            (utf8.to_bytes(n), v) for n, v in needles_with_values
        ]
        self._machine = machine if machine is not None else ac.build(self._needles)
        self._engine_name = engine
        self._engine = MatchEngine(self._machine, engine)

    # -- construction (Searcher.hs:110-118, 167-169) -----------------------

    @classmethod
    def build(
        cls, case: CaseSensitivity, needles: Iterable[utf8.TextLike], engine: str = "auto"
    ) -> "Searcher":
        return cls(case, [(utf8.to_bytes(n), ()) for n in needles], engine=engine)

    @classmethod
    def build_with_values(
        cls,
        case: CaseSensitivity,
        needles_with_values: Iterable[Tuple[utf8.TextLike, Any]],
        engine: str = "auto",
    ) -> "Searcher":
        return cls(case, [(utf8.to_bytes(n), v) for n, v in needles_with_values], engine=engine)

    @classmethod
    def build_needle_id_searcher(
        cls, case: CaseSensitivity, needles: Iterable[utf8.TextLike], engine: str = "auto"
    ) -> "Searcher":
        """Values are needle indices (for ``contains_all``, ``Searcher.hs:167-169``)."""
        return cls(case, [(utf8.to_bytes(n), i) for i, n in enumerate(needles)], engine=engine)

    # -- accessors ---------------------------------------------------------

    @property
    def needles(self) -> List[Tuple[bytes, Any]]:
        return list(self._needles)

    @property
    def num_needles(self) -> int:
        return len(self._needles)

    @property
    def case_sensitivity(self) -> CaseSensitivity:
        return self._case

    @property
    def automaton(self) -> ac.AcMachine:
        return self._machine

    def set_case_sensitivity(self, case: CaseSensitivity) -> "Searcher":
        """Switch case mode without re-capitalizing needles; when passing
        IGNORE_CASE the caller must be sure needles are already lowercase
        (``Searcher.hs:139-145``)."""
        return Searcher(case, self._needles, machine=self._machine, engine=self._engine_name)

    def map_searcher(self, f: Callable[[Any], Any]) -> "Searcher":
        """Map over the values (``mapSearcher``, ``Searcher.hs:121-125``)."""
        return Searcher(
            self._case,
            [(n, f(v)) for n, v in self._needles],
            machine=self._machine.map_values(f),
            engine=self._engine_name,
        )

    # -- equality / hashing by needles (Searcher.hs:82-90) ----------------

    def _key(self):
        return (self._case, tuple((n, _hashable(v)) for n, v in self._needles))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Searcher) and self._key() == other._key()

    def __hash__(self) -> int:
        return hash(self._key())

    def __repr__(self) -> str:
        return f"Searcher({self._case}, {self.num_needles} needles)"

    # -- Semigroup for unit values (Searcher.hs:100-105) -------------------

    def __add__(self, other: "Searcher") -> "Searcher":
        if self._case != other._case:
            raise ValueError("Combining searchers of different case sensitivity")
        return Searcher(self._case, self._needles + other._needles, engine=self._engine_name)

    # -- serialization by needles (Searcher.hs:68-77) ----------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "caseSensitivity": self._case.to_json(),
                "needles": [[n.decode("utf-8"), v] for n, v in self._needles],
            }
        )

    @classmethod
    def from_json(cls, blob: str, engine: str = "auto") -> "Searcher":
        obj = json.loads(blob)
        case = CaseSensitivity.from_json(obj["caseSensitivity"])
        pairs = [(n.encode("utf-8"), v) for n, v in obj["needles"]]
        return cls(case, pairs, engine=engine)

    # -- packed-table cold-start artifact (TPU-native extension) ------------

    def save_npz(self, path: str) -> None:
        """Persist the built tables (no automaton rebuild on load, unlike
        the JSON-by-needles form).  Values must be in the typed-JSON codec's
        closed set (scalars, bytes, containers, Replacer Payloads)."""
        ac.save_npz(
            self._machine, path, extra={"caseSensitivity": self._case.to_json()}
        )

    @classmethod
    def load_npz(cls, path: str, engine: str = "auto") -> "Searcher":
        machine, extra = ac.load_npz(path, with_extra=True)
        case = CaseSensitivity.from_json(extra["caseSensitivity"])
        return cls(
            case, list(zip(machine.needles, machine.values)),
            machine=machine, engine=engine,
        )

    # -- matching ----------------------------------------------------------

    def stage(self, haystack: utf8.TextLike):
        """Prepare a haystack for repeated scans (lowering + device staging
        done once); pass the result to any matching operation."""
        return self._engine.stage(haystack, self._case)

    def adopt_staged(self, staged):
        """Rebind ANOTHER searcher's staged haystack to this searcher — the
        live needle-set-swap path for serving: the corpus's device streams
        (machine-independent layout) and host lowering are reused instead
        of re-paying the host->device transfer (~60 MB/s on tunneled
        relays; 17 s for a 1 GiB corpus) and the lowering pass.  Exact: the
        staged warm-up overlap is validated against this searcher's
        needle-length synchronization window, with a transparent restage
        from the staged bytes when layouts are incompatible.  Raises
        ValueError when the staging retained only lowered bytes and this
        searcher needs raw ones (stage the raw text instead)."""
        return self._engine.adopt_staged(staged, self._case)

    def distributed(self, mesh, inner: str = "auto", **kw):
        """A ``parallel.DistributedAcEngine`` scanning this searcher's
        automaton over a ``(data, seq, needle)`` device mesh (counts via
        ``psum``, match sets identical to single-chip for any mesh shape).

        IgnoreCase searchers scan the RAW bytes with the composed
        case-folding DFA (``models.case_dfa``), so the distributed layer
        needs no lowering stage; this requires whole-code-point needles.
        """
        from .parallel import DistributedAcEngine

        machine = self._machine
        sub_build = None
        if self._case is IGNORE_CASE:
            ci = self._engine._composed(self._case)
            if ci is None:
                raise ValueError(
                    "IgnoreCase distributed scans need the composed case DFA "
                    "(whole-code-point needles; see AMT_COMPOSED_CI)"
                )
            machine = ci.machine
            from .models import case_dfa

            sub_build = case_dfa.compose_build  # needle groups stay composed
        return DistributedAcEngine(machine, mesh, inner=inner, sub_build=sub_build, **kw)

    def contains_any(self, haystack: utf8.TextLike) -> bool:
        """True iff any needle occurs (``containsAny``, ``Searcher.hs:156-164``)."""
        return self._engine.contains_any(haystack, self._case)

    def contains_all(self, haystack: utf8.TextLike) -> bool:
        """True iff every needle occurs; requires a needle-id searcher
        (``containsAll``, ``Searcher.hs:173-187``)."""
        if self.num_needles == 0:
            return True
        presence = self._engine.value_presence(haystack, self._case)
        return bool(presence.all())

    def count_matches(self, haystack: utf8.TextLike) -> int:
        return self._engine.count(haystack, self._case)

    def all_matches(self, haystack: utf8.TextLike) -> List[ac.Match]:
        """Reference-shaped result: a list of ``Match(pos, value)``.  For
        bulk consumers (millions of matches) prefer
        :meth:`all_matches_arrays` — materializing Python objects dominates
        the scan cost by ~100x at scale."""
        ms = self._engine.matches(haystack, self._case)
        values = self._machine.values
        # tolist + map: C-speed conversion, no per-element int() round-trips.
        return list(
            map(ac.Match, ms.ends.tolist(), map(values.__getitem__, ms.value_ids.tolist()))
        )

    def all_matches_arrays(self, haystack: utf8.TextLike):
        """(ends, value_ids) numpy arrays in emission order — the zero-copy
        bulk-result API (``ends`` are raw byte positions one past each
        match; ``value_ids`` index :attr:`automaton` ``.values``)."""
        ms = self._engine.matches(haystack, self._case)
        return ms.ends, ms.value_ids


def _hashable(v: Any):
    if isinstance(v, (list, np.ndarray)):
        return tuple(v)
    return v


__all__ = ["Searcher"]
