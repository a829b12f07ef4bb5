"""Runtime configuration (SURVEY.md §5.6).

The reference's only knobs are two cabal flags and ``CaseSensitivity``;
this build's runtime knobs live in one dataclass, overridable from the
environment (prefix ``AMT_``):

  AMT_ENGINE       auto | python | xla | pallas | cpp
  AMT_N_STREAMS    Pallas stream count (multiple of 128)
  AMT_T_TILE       Pallas time tile
  AMT_INTERPRET    1 -> Pallas interpreter mode (CPU debugging)
  AMT_VALIDATE     1 -> cross-check device counts against the native C++
                   engine on every scan (the debug analogue of the
                   reference's bounds-checked era, Automaton.hs:382-392)
  AMT_NO_NATIVE    1 -> never load the C++ helper library
  AMT_COMPOSED_CI  max automaton states for which IgnoreCase scans build
                   the composed case-folding DFA (models.case_dfa) and scan
                   raw bytes; 0 disables composition entirely
  AMT_STREAM_CHUNK_MB  out-of-core chunk size: device scans of inputs
                   larger than 2x this stream through fixed-size staged
                   chunks (ops.streaming) instead of staging the whole
                   corpus in HBM

Knobs read at point of use (not part of this dataclass):

  AMT_PREFILTER    1/0 force/disable the host 5-byte-window prefilter
                   engine (native.prefilter)
  AMT_FILTER       0 disables the stride-2 containsAny screen
                   (ops.filter_scan)
  AMT_HOST_CLASS   0 disables the host byte-class packed table
                   (native.cpp_engine; builds lazily at the cumulative-
                   bytes break-even)
  AMT_MALLOC_TUNE  0 disables the large-buffer malloc arena tuning
                   (native.build._tune_malloc)
  AMT_NATIVE_CACHE directory for the compiled C++ engine .so
  AMT_TPU_TESTS / AMT_MULTIPROC_TESTS  opt-in test lanes (tests/conftest)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


def _env_int(name: str, default: Optional[int]) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass(frozen=True)
class EngineConfig:
    engine: str = "auto"
    n_streams: int = 32768
    t_tile: int = 128
    interpret: bool = False
    validate: bool = False
    composed_ci_max_states: int = 4096
    stream_chunk_mb: int = 128

    @staticmethod
    def from_env() -> "EngineConfig":
        return EngineConfig(
            engine=os.environ.get("AMT_ENGINE", "auto"),
            n_streams=_env_int("AMT_N_STREAMS", 32768),
            t_tile=_env_int("AMT_T_TILE", 128),
            interpret=bool(os.environ.get("AMT_INTERPRET")),
            validate=bool(os.environ.get("AMT_VALIDATE")),
            composed_ci_max_states=_env_int("AMT_COMPOSED_CI", 4096),
            stream_chunk_mb=_env_int("AMT_STREAM_CHUNK_MB", 128),
        )


DEFAULT = EngineConfig.from_env()

__all__ = ["EngineConfig", "DEFAULT"]
