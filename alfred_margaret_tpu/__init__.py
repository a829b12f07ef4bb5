"""alfred_margaret_tpu: a TPU-native multi-pattern string matching framework.

A from-scratch rebuild of the capabilities of channable/alfred-margaret
(Aho-Corasick + Boyer-Moore text search over raw UTF-8) designed TPU-first:

* offline automaton construction into dense ``state x 256`` byte-transition
  tables (DFA-ized: no failure-link chasing at match time),
* batched gather-per-byte scan engines (XLA ``lax.scan`` and Pallas kernels)
  that advance many input streams in parallel per chip,
* corpus sharding across a ``jax.sharding.Mesh`` with ``psum`` match-count
  reduction for multi-chip / multi-host scale,
* bit-exact match/replace semantics against the reference implementation.
"""

from .utils.case import CASE_SENSITIVE, IGNORE_CASE, CaseSensitivity
from .searcher import Searcher
from .replacer import Payload, Replacer
from .splitter import Splitter

__version__ = "0.5.0"

__all__ = [
    "CaseSensitivity",
    "CASE_SENSITIVE",
    "IGNORE_CASE",
    "Searcher",
    "Replacer",
    "Payload",
    "Splitter",
]
