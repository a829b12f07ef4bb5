"""Lazy ctypes build/load of the native engine library.

Compiles ``am_native.cpp`` with g++ on first use and caches the shared
object next to the source (keyed by a source hash), so importing the
package never requires a compile step unless the native path is used.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "am_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "AMT_NATIVE_CACHE", os.path.join(_DIR, "_build")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"am_native_{digest}.so")


def _tune_malloc() -> None:
    """Keep large buffers in the malloc arena instead of per-allocation
    mmaps (M_MMAP_THRESHOLD): a fresh 64 MB splice/output buffer otherwise
    page-faults at ~0.2-2 GB/s on this class of VM — measured as the
    single largest Replacer.run cost at config-4 sizes — while arena reuse
    runs the same fill at ~4-5 GB/s.  Process-wide, best-effort, opt-out
    via AMT_MALLOC_TUNE=0."""
    if os.environ.get("AMT_MALLOC_TUNE") == "0":
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
    except Exception:
        pass


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native library; raises
    NativeUnavailable when no toolchain is present."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        _tune_malloc()
        so = _so_path()
        if not os.path.exists(so):
            cmd = [
                "g++",
                "-O3",
                "-std=c++17",
                "-march=native",
                "-shared",
                "-fPIC",
                "-pthread",
                _SRC,
                "-o",
                so + ".tmp",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
                detail = getattr(e, "stderr", b"")
                raise NativeUnavailable(f"native build failed: {e} {detail!r}") from e
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.am_scan_count.restype = ctypes.c_int64
        lib.am_scan_count.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.am_scan_states.restype = ctypes.c_int32
        lib.am_scan_states.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.am_expand_hit_bits.restype = ctypes.c_int64
        lib.am_expand_hit_bits.argtypes = [
            ctypes.c_void_p,  # t_words (int64)
            ctypes.c_void_p,  # s_idx (int64)
            ctypes.c_void_p,  # wval (int32)
            ctypes.c_int64,   # n_words
            ctypes.c_void_p,  # warm (int64)
            ctypes.c_void_p,  # vend (int64)
            ctypes.c_int64,   # S
            ctypes.c_int64,   # L
            ctypes.c_void_p,  # out (int64)
            ctypes.c_int32,   # n_threads
        ]
        lib.am_states_at.restype = None
        lib.am_states_at.argtypes = [
            ctypes.c_void_p,  # delta
            ctypes.c_void_p,  # data
            ctypes.c_int64,   # n
            ctypes.c_void_p,  # pos (int64)
            ctypes.c_int64,   # n_pos
            ctypes.c_int32,   # w
            ctypes.c_void_p,  # out_states (int32)
            ctypes.c_int32,   # n_threads
        ]
        lib.am_scan_count_mt.restype = ctypes.c_int64
        lib.am_scan_count_mt.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.am_scan_states_mt.restype = None
        lib.am_scan_states_mt.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.am_scan_count_class_mt.restype = ctypes.c_int64
        lib.am_scan_count_class_mt.argtypes = [
            ctypes.c_void_p,  # tab (premultiplied class-packed, int32[S*C])
            ctypes.c_void_p,  # cls (int32[256] byte -> class)
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
        ]
        lib.am_scan_hits_class_mt.restype = ctypes.c_int64
        lib.am_scan_hits_class_mt.argtypes = [
            ctypes.c_void_p,  # tab
            ctypes.c_void_p,  # cls
            ctypes.c_int32,  # n_classes
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
            ctypes.c_void_p,  # out_pos
            ctypes.c_void_p,  # out_state
            ctypes.c_int64,  # cap
        ]
        lib.am_scan_hits_mt.restype = ctypes.c_int64
        lib.am_scan_hits_mt.argtypes = [
            ctypes.c_void_p,  # delta
            ctypes.c_void_p,  # match_count
            ctypes.c_int32,  # n_states
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
            ctypes.c_void_p,  # out_pos
            ctypes.c_void_p,  # out_state
            ctypes.c_int64,  # cap
        ]
        lib.am_bitap_count_mt.restype = ctypes.c_int64
        lib.am_bitap_count_mt.argtypes = [
            ctypes.c_void_p,  # btab (uint64[256])
            ctypes.c_uint64,  # seed
            ctypes.c_uint64,  # endmask
            ctypes.c_void_p,  # data
            ctypes.c_int64,   # n
            ctypes.c_int64,   # overlap
            ctypes.c_int32,   # n_threads
        ]
        lib.am_bitap_first.restype = ctypes.c_int64
        lib.am_bitap_first.argtypes = [
            ctypes.c_void_p,  # btab
            ctypes.c_uint64,  # seed
            ctypes.c_uint64,  # endmask
            ctypes.c_void_p,  # data
            ctypes.c_int64,   # n
        ]
        lib.am_scan_first_hit_class.restype = ctypes.c_int64
        lib.am_scan_first_hit_class.argtypes = [
            ctypes.c_void_p,  # tab
            ctypes.c_void_p,  # cls
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
        ]
        lib.am_scan_all_values_class.restype = ctypes.c_int64
        lib.am_scan_all_values_class.argtypes = [
            ctypes.c_void_p,  # tab
            ctypes.c_void_p,  # cls
            ctypes.c_int32,  # n_classes
            ctypes.c_void_p,  # out_offset
            ctypes.c_void_p,  # out_values
            ctypes.c_int32,  # n_values
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
            ctypes.c_void_p,  # out_seen
        ]
        lib.am_scan_first_hit.restype = ctypes.c_int64
        lib.am_scan_first_hit.argtypes = [
            ctypes.c_void_p,  # delta
            ctypes.c_void_p,  # match_count
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
        ]
        lib.am_scan_all_values.restype = ctypes.c_int64
        lib.am_scan_all_values.argtypes = [
            ctypes.c_void_p,  # delta
            ctypes.c_void_p,  # match_count
            ctypes.c_void_p,  # out_offset
            ctypes.c_void_p,  # out_values
            ctypes.c_int32,  # n_values
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_int64,  # overlap
            ctypes.c_int32,  # n_threads
            ctypes.c_void_p,  # out_seen
        ]
        lib.am_scan_segments_hits.restype = ctypes.c_int64
        lib.am_scan_segments_hits.argtypes = [
            ctypes.c_void_p,  # delta
            ctypes.c_void_p,  # match_count
            ctypes.c_void_p,  # data
            ctypes.c_void_p,  # seg_begin
            ctypes.c_void_p,  # seg_end
            ctypes.c_int64,  # n_segs
            ctypes.c_void_p,  # out_pos
            ctypes.c_void_p,  # out_state
            ctypes.c_int64,  # cap
        ]
        lib.am_splice.restype = ctypes.c_int64
        lib.am_splice.argtypes = [
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # starts
            ctypes.c_void_p,  # ends
            ctypes.c_int64,  # n_sites
            ctypes.c_void_p,  # repl
            ctypes.c_int64,  # repl_len
            ctypes.c_void_p,  # out
        ]
        lib.am_splice_mt.restype = ctypes.c_int64
        lib.am_splice_mt.argtypes = lib.am_splice.argtypes + [
            ctypes.c_int32,  # n_threads
        ]
        lib.am_splice_multi.restype = ctypes.c_int64
        lib.am_splice_multi.argtypes = [
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # starts
            ctypes.c_void_p,  # ends
            ctypes.c_int64,  # n_sites
            ctypes.c_void_p,  # repl_blob
            ctypes.c_void_p,  # repl_off
            ctypes.c_void_p,  # rid (int32 per-site replacement ids)
            ctypes.c_void_p,  # out
            ctypes.c_int32,  # n_threads
        ]
        lib.am_remove_overlap.restype = ctypes.c_int64
        lib.am_remove_overlap.argtypes = [
            ctypes.c_void_p,  # starts
            ctypes.c_void_p,  # ends
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # kept_starts
            ctypes.c_void_p,  # kept_ends
        ]
        lib.am_memscan_baseline.restype = ctypes.c_int64
        lib.am_memscan_baseline.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.am_lower_transform.restype = ctypes.c_int64
        lib.am_lower_transform.argtypes = [
            ctypes.c_void_p,  # lower_map
            ctypes.c_void_p,  # emap (pre-encoded BMP lowered sequences)
            ctypes.c_void_p,  # data
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # out
            ctypes.c_int64,  # out_cap
            ctypes.c_void_p,  # raw_start
            ctypes.c_void_p,  # raw_len
            ctypes.c_void_p,  # out_len
            ctypes.c_void_p,  # out_nbytes
        ]
        lib.am_lower_bytes.restype = ctypes.c_int32
        lib.am_lower_bytes.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.am_lower_ascii.restype = None
        lib.am_lower_ascii.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.am_is_ascii.restype = ctypes.c_int32
        lib.am_is_ascii.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _pf = [
            ctypes.c_void_p, ctypes.c_int64,  # bloom, bloom_words
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,  # nb_off, nb_bytes
            ctypes.c_void_p, ctypes.c_int64,  # data, n
        ]
        lib.am_prefilter_count.restype = ctypes.c_int64
        lib.am_prefilter_count.argtypes = _pf + [ctypes.c_int32]
        lib.am_prefilter_first.restype = ctypes.c_int64
        lib.am_prefilter_first.argtypes = list(_pf)
        _LIB = lib
        return lib


def default_threads() -> int:
    return min(16, os.cpu_count() or 1)
