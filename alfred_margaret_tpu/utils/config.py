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

    @staticmethod
    def from_env() -> "EngineConfig":
        return EngineConfig(
            engine=os.environ.get("AMT_ENGINE", "auto"),
            n_streams=_env_int("AMT_N_STREAMS", 32768),
            t_tile=_env_int("AMT_T_TILE", 128),
            interpret=bool(os.environ.get("AMT_INTERPRET")),
            validate=bool(os.environ.get("AMT_VALIDATE")),
        )


DEFAULT = EngineConfig.from_env()

__all__ = ["EngineConfig", "DEFAULT"]
