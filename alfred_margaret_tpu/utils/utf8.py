"""UTF-8 byte layer: decoding, slicing, Unicode simple case mapping.

TPU-native counterpart of the reference's L1 layer
(``src/Data/Text/Utf8.hs``, ``src/Data/Text/Utf8/Unlower.hs``): we treat text
as raw UTF-8 bytes (``bytes`` / ``np.uint8`` arrays), positions are *code unit*
(byte) indices, and case-insensitivity uses the simple per-code-point Unicode
lowercase mapping (``Utf8.hs:145-151`` — ASCII fast path, else simple
``toLower``), frozen into this repo as a table artifact.

Two implementation tiers live here:

* scalar helpers mirroring the reference API (the oracle / host path):
  ``lower_code_point``, ``unlower_code_point``, ``skip_code_points_backwards``,
  ``unsafe_cut_utf8`` … (cf. ``Utf8.hs:20-75``)
* vectorized numpy codecs used by the engines: ``decode_utf8_np`` and
  ``lower_transform`` (the byte-stream lowercase transducer that also carries
  raw-byte coordinates so IgnoreCase match positions are reported in raw
  coordinates, the TPU-side replacement for the reference's on-the-fly
  per-code-point lowering in ``AhoCorasick/Automaton.hs:468-480``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Tuple, Union

import numpy as np

MAX_CP = 0x110000

TextLike = Union[str, bytes, bytearray, np.ndarray]

# ---------------------------------------------------------------------------
# Frozen case tables
# ---------------------------------------------------------------------------

_DATA_DIR = os.path.join(os.path.dirname(__file__), "_data")


def _load_lower_pairs() -> np.ndarray:
    path = os.path.join(_DATA_DIR, "lower_pairs.npy")
    if not os.path.exists(path):  # pragma: no cover - regenerated on demand
        from . import _gen_unicode_tables

        _gen_unicode_tables.main()
    return np.load(path)


_LOWER_PAIRS = _load_lower_pairs()

#: Dense simple-lowercase table over all of Unicode: LOWER_TABLE[cp] == lower cp.
LOWER_TABLE = np.arange(MAX_CP, dtype=np.int32)
LOWER_TABLE[_LOWER_PAIRS[:, 0]] = _LOWER_PAIRS[:, 1]

#: ASCII-only byte-level lowercase map (A-Z += 0x20), identity elsewhere.
ASCII_LOWER_BYTES = np.arange(256, dtype=np.uint8)
ASCII_LOWER_BYTES[ord("A") : ord("Z") + 1] += 0x20


@lru_cache(maxsize=1)
def _unlower_map() -> dict:
    """lower cp -> list of cps that lower to it, descending cp order.

    Order matches the reference's construction (``Unlower.hs:32-40``): a fold
    over ascending code points prepending each, i.e. descending order.
    """
    m: dict = {}
    for cp, low in _LOWER_PAIRS:
        m.setdefault(int(low), []).append(int(cp))
    for low, ups in m.items():
        if LOWER_TABLE[low] == low:
            ups.append(low)
        ups.sort(reverse=True)
    return m


# ---------------------------------------------------------------------------
# Scalar case mapping API (mirrors Utf8.hs:20-75)
# ---------------------------------------------------------------------------


def to_lower_ascii(c: str) -> str:
    """Lowercase A-Z only, identity elsewhere (``Utf8.hs:131-135``)."""
    return chr(ord(c) + 0x20) if "A" <= c <= "Z" else c


def lower_code_point(c: str) -> str:
    """Simple Unicode lowercase of one code point (``Utf8.hs:145-151``)."""
    return chr(int(LOWER_TABLE[ord(c)]))


def lower_str(text: str) -> str:
    """Lowercase a string per code point (``lowerUtf8``, ``Utf8.hs:138-140``)."""
    return "".join(chr(int(c)) for c in LOWER_TABLE[np.fromiter(map(ord, text), np.int32, len(text))])


# Reference spelling.
lower_utf8 = lower_str


def unlower_code_point(c: str) -> str:
    """All code points whose simple lowercase is ``c`` (``Unlower.hs:26-28``).

    Descending code point order; empty if ``c`` is not the lowercase of
    anything (e.g. 'A'), ``c`` itself if it has no case variants.
    """
    cp = ord(c)
    ups = _unlower_map().get(cp)
    if ups is None:
        # Not a lowercase image of any non-trivial mapping: identity preimage
        # {c} if c is its own lowercase, else empty.
        return c if LOWER_TABLE[cp] == cp else ""
    return "".join(map(chr, ups))


def is_case_invariant(text: str) -> bool:
    """True iff every cp satisfies unlower(lower(c)) == [c] (``Utf8.hs:169-171``)."""
    return all(unlower_code_point(lower_code_point(c)) == c for c in text)


# ---------------------------------------------------------------------------
# Scalar UTF-8 codec (mirrors Utf8.hs:154-350)
# ---------------------------------------------------------------------------


def unicode2utf8(cp: int) -> List[int]:
    """Encode one code point to UTF-8 bytes (``Utf8.hs:154-160``)."""
    if cp < 0x80:
        return [cp]
    if cp < 0x800:
        return [0xC0 | (cp >> 6), 0x80 | (cp & 0x3F)]
    if cp < 0x10000:
        return [0xE0 | (cp >> 12), 0x80 | ((cp >> 6) & 0x3F), 0x80 | (cp & 0x3F)]
    return [
        0xF0 | (cp >> 18),
        0x80 | ((cp >> 12) & 0x3F),
        0x80 | ((cp >> 6) & 0x3F),
        0x80 | (cp & 0x3F),
    ]


def to_bytes(text: TextLike) -> bytes:
    """Canonicalize any supported text-like input to UTF-8 bytes."""
    if isinstance(text, str):
        return text.encode("utf-8")
    if isinstance(text, np.ndarray):
        return text.astype(np.uint8).tobytes()
    return bytes(text)


def to_u8(text: TextLike) -> np.ndarray:
    """Canonicalize text-like input to an np.uint8 array."""
    if isinstance(text, np.ndarray):
        return np.ascontiguousarray(text, dtype=np.uint8)
    return np.frombuffer(to_bytes(text), dtype=np.uint8)


def length_utf8(text: TextLike) -> int:
    """Length in code units (bytes) (``Utf8.hs:127-128``)."""
    return len(to_bytes(text))


def num_code_units(cp: int) -> int:
    """UTF-8 encoded byte length of a code point."""
    if cp < 0x80:
        return 1
    if cp < 0x800:
        return 2
    if cp < 0x10000:
        return 3
    return 4


def decode_code_point(data: bytes, idx: int) -> Tuple[int, int]:
    """Decode the code point starting at byte ``idx``.

    Returns (number of code units consumed, code point) like
    ``unsafeIndexCodePoint'`` / ``decodeN`` (``Utf8.hs:337-350``). The
    reference assumes valid UTF-8 (guaranteed by Haskell's ``Text``); since
    our surface accepts raw ``bytes``, malformed sequences (stray trail
    bytes, truncated sequences, invalid leads) are consumed as single-byte
    pseudo code points instead of raising.
    """
    b0 = data[idx]
    if b0 < 0x80:
        return 1, b0
    n = len(data)
    if 0xC0 <= b0 < 0xE0 and idx + 1 < n:
        return 2, ((b0 & 0x1F) << 6) | (data[idx + 1] & 0x3F)
    if 0xE0 <= b0 < 0xF0 and idx + 2 < n:
        return (
            3,
            ((b0 & 0x0F) << 12) | ((data[idx + 1] & 0x3F) << 6) | (data[idx + 2] & 0x3F),
        )
    if 0xF0 <= b0 < 0xF9 and idx + 3 < n:
        return (
            4,
            ((b0 & 0x07) << 18)
            | ((data[idx + 1] & 0x3F) << 12)
            | ((data[idx + 2] & 0x3F) << 6)
            | (data[idx + 3] & 0x3F),
        )
    # Malformed: treat as an isolated single-byte unit.
    return 1, b0


def is_trail_byte(b: int) -> bool:
    """True for UTF-8 continuation bytes (``Utf8.hs:276``)."""
    return (b & 0xC0) == 0x80


def skip_code_points_backwards(text: TextLike, idx: int, n: int) -> int:
    """From byte ``idx``, move to the start of its code point, then skip ``n``
    more code points backwards; return the byte index of the resulting code
    point's first byte (``Utf8.hs:256-276``).

    Raises IndexError when reading out of bounds, matching the reference's
    bounds-checked behavior.
    """
    data = to_bytes(text)
    if idx >= len(data) or idx < 0:
        raise IndexError(f"skip_code_points_backwards: index {idx} out of bounds")
    while is_trail_byte(data[idx]):
        idx -= 1
        if idx < 0:
            raise IndexError("skip_code_points_backwards: ran past start of text")
    for _ in range(n):
        idx -= 1
        if idx < 0:
            raise IndexError("skip_code_points_backwards: ran past start of text")
        while is_trail_byte(data[idx]):
            idx -= 1
            if idx < 0:
                raise IndexError("skip_code_points_backwards: ran past start of text")
    return idx


def unsafe_slice_utf8(begin: int, length: int, text: TextLike) -> bytes:
    """Byte slice [begin, begin+length) (``Utf8.hs:317-319``)."""
    return to_bytes(text)[begin : begin + length]


def unsafe_cut_utf8(begin: int, length: int, text: TextLike) -> Tuple[bytes, bytes]:
    """(prefix before begin, suffix after begin+length) (``Utf8.hs:308-315``)."""
    data = to_bytes(text)
    return data[:begin], data[begin + length :]


# ---------------------------------------------------------------------------
# Vectorized numpy codec (engine-facing)
# ---------------------------------------------------------------------------

# Byte length of the code point started by each possible lead byte; trail
# bytes map to 0 so they are easy to mask out.
_LEAD_LEN = np.zeros(256, dtype=np.int8)
_LEAD_LEN[0x00:0x80] = 1
_LEAD_LEN[0xC0:0xE0] = 2
_LEAD_LEN[0xE0:0xF0] = 3
_LEAD_LEN[0xF0:0xF9] = 4


def decode_utf8_np(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized UTF-8 decode of a full valid byte array.

    Returns ``(code_points, starts, lens)`` where ``starts[i]`` is the byte
    offset of code point ``i`` and ``lens[i]`` its byte length.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy(), z.copy()
    lens_at = _LEAD_LEN[arr]
    starts = np.flatnonzero(lens_at).astype(np.int32)
    lens = lens_at[starts].astype(np.int32)
    # Pad so unconditional gathers at starts+1..3 stay in bounds.
    padded = np.empty(n + 3, dtype=np.int32)
    padded[:n] = arr
    padded[n:] = 0
    b0 = padded[starts]
    b1 = padded[starts + 1] & 0x3F
    b2 = padded[starts + 2] & 0x3F
    b3 = padded[starts + 3] & 0x3F
    cps = np.where(
        lens == 1,
        b0,
        np.where(
            lens == 2,
            ((b0 & 0x1F) << 6) | b1,
            np.where(
                lens == 3,
                ((b0 & 0x0F) << 12) | (b1 << 6) | b2,
                ((b0 & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3,
            ),
        ),
    ).astype(np.int32)
    return cps, starts, lens


def encode_utf8_np(cps: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized UTF-8 encode. Returns ``(bytes_u8, out_lens_per_cp)``."""
    cps = np.ascontiguousarray(cps, dtype=np.int32)
    out_lens = np.where(cps < 0x80, 1, np.where(cps < 0x800, 2, np.where(cps < 0x10000, 3, 4))).astype(
        np.int32
    )
    offsets = np.zeros(len(cps), dtype=np.int64)
    np.cumsum(out_lens[:-1], out=offsets[1:]) if len(cps) > 1 else None
    total = int(out_lens.sum())
    out = np.zeros(total, dtype=np.uint8)

    l1 = out_lens == 1
    l2 = out_lens == 2
    l3 = out_lens == 3
    l4 = out_lens == 4
    # byte 0
    b0 = np.where(l1, cps, np.where(l2, 0xC0 | (cps >> 6), np.where(l3, 0xE0 | (cps >> 12), 0xF0 | (cps >> 18))))
    out[offsets] = b0.astype(np.uint8)
    # byte 1
    m = out_lens >= 2
    b1 = np.where(l2, 0x80 | (cps & 0x3F), np.where(l3, 0x80 | ((cps >> 6) & 0x3F), 0x80 | ((cps >> 12) & 0x3F)))
    out[offsets[m] + 1] = b1[m].astype(np.uint8)
    # byte 2
    m = out_lens >= 3
    b2 = np.where(l3, 0x80 | (cps & 0x3F), 0x80 | ((cps >> 6) & 0x3F))
    out[offsets[m] + 2] = b2[m].astype(np.uint8)
    # byte 3
    m = out_lens == 4
    out[offsets[m] + 3] = (0x80 | (cps[m] & 0x3F)).astype(np.uint8)
    return out, out_lens


@dataclass
class LoweredText:
    """A lowercased byte stream annotated with raw-byte coordinates.

    IgnoreCase engines match on ``lowered`` but must report positions in the
    *raw* haystack's byte coordinates (the reference achieves this by decoding
    code-point-wise on the fly and counting raw code units,
    ``AhoCorasick/Automaton.hs:468-480``; we lower up front and carry maps).

    Attributes:
      lowered:   np.uint8 lowered byte stream (byte lengths may differ from raw!)
      cp_index:  np.int32 per lowered byte: index of the code point it encodes
      raw_start: np.int32 per code point: raw byte offset of its first raw byte
      raw_end:   np.int32 per code point: raw byte offset one past its last raw byte
    """

    lowered: np.ndarray
    cp_index: np.ndarray
    raw_start: np.ndarray
    raw_end: np.ndarray

    @property
    def n_code_points(self) -> int:
        return len(self.raw_start)

    def match_raw_end(self, lowered_end: int) -> int:
        """Map a lowered-coords match end (one past last byte) to raw coords."""
        return int(self.raw_end[self.cp_index[lowered_end - 1]])

    def match_raw_start_by_cp_len(self, lowered_end: int, needle_cp_len: int) -> int:
        """Raw byte offset of the match start, given the needle's length in
        code points — the coordinate the reference recovers via
        ``skipCodePointsBackwards`` (``Replacer.hs:264-274``)."""
        end_cp = int(self.cp_index[lowered_end - 1])
        start_cp = end_cp - (needle_cp_len - 1)
        return int(self.raw_start[start_cp])


def lower_transform(text: TextLike) -> LoweredText:
    """Lowercase a UTF-8 byte stream, carrying raw coordinates.

    ASCII-only inputs take a pure byte-LUT fast path; otherwise the stream is
    decoded, mapped through the frozen simple-lowercase table, and re-encoded
    (byte lengths can shrink — İ 2B→i 1B — or grow — Ⱥ 2B→ⱥ 3B).
    """
    arr = to_u8(text)
    n = len(arr)
    if n == 0 or int(arr.max(initial=0)) < 0x80:
        idx = np.arange(n, dtype=np.int32)
        return LoweredText(
            lowered=ASCII_LOWER_BYTES[arr],
            cp_index=idx,
            raw_start=idx.copy(),
            raw_end=idx + 1,
        )
    cps, starts, lens = decode_utf8_np(arr)
    low_cps = LOWER_TABLE[cps]
    lowered, out_lens = encode_utf8_np(low_cps)
    cp_index = np.repeat(np.arange(len(cps), dtype=np.int32), out_lens)
    return LoweredText(
        lowered=lowered,
        cp_index=cp_index,
        raw_start=starts,
        raw_end=(starts + lens).astype(np.int32),
    )
