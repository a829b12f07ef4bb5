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

import os
from dataclasses import dataclass, replace as dc_replace
from typing import Any, Callable, Iterable, List, Optional, Tuple

import numpy as np

from .searcher import Searcher
from .utils import utf8
from .utils.case import IGNORE_CASE, CaseSensitivity

MAX_BOUND = 2**63 - 1

#: The incremental multi-pass engine (one full scan; later passes patch the
#: match list and rescan only windows around splice sites).  Exact for
#: CaseSensitive and composed-CI scans because a DFA match depends only on
#: its own span's bytes: matches not intersecting a replaced range survive
#: verbatim (shifted), and every new match must intersect one.  Escape
#: hatch for debugging: AMT_NO_INCREMENTAL=1 forces full rescans per pass.
INCREMENTAL = not os.environ.get("AMT_NO_INCREMENTAL")


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

    # -- packed-table cold-start artifact ------------------------------------

    def save_npz(self, path: str) -> None:
        """Persist the built tables including the Payload values (the
        typed-JSON npz codec handles them; see ``models.ac.save_npz``)."""
        self.searcher.save_npz(path)

    @classmethod
    def load_npz(cls, path: str, engine: str = "auto") -> "Replacer":
        return cls(Searcher.load_npz(path, engine=engine))

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

    def run(self, haystack) -> Any:
        result = self.run_with_limit(haystack, MAX_BOUND)
        assert result is not None
        return result

    def run_with_limit(self, haystack, max_length: int) -> Optional[Any]:
        """Replace everything unless the intermediate result would exceed
        ``max_length`` bytes (``runWithLimit``, ``Replacer.hs:203-274``).

        Returns the same type as the input (str in, str out; staged in,
        bytes out).

        ``haystack`` may be a :class:`engine.StagedHaystack` from
        ``replacer.searcher.stage(...)`` (or ``adopt_staged``): the FIRST
        pass's full scan then reuses the staged lowering/device streams —
        the serving pattern where one resident corpus feeds both search and
        replacement.  Later passes operate on the spliced host text, whose
        re-scans are window-local (incremental engine) and never touch the
        device.
        """
        from .engine import StagedHaystack

        staged = haystack if isinstance(haystack, StagedHaystack) else None
        if staged is not None and staged.lowered is not None:
            # Non-composed IgnoreCase staging keeps only the LOWERED bytes;
            # splicing needs the raw haystack, which the handle no longer
            # has.  (Composed-CI stagings keep raw bytes and work fine.)
            raise ValueError(
                "this staged haystack retains only the lowered bytes "
                "(non-composed IgnoreCase staging); Replacer.run needs the "
                "raw text — pass the original haystack, or raise "
                "AMT_COMPOSED_CI so staging uses the composed case DFA"
            )
        as_str = isinstance(haystack, str)
        data = utf8.to_bytes(staged.data) if staged is not None else utf8.to_bytes(haystack)
        if staged is not None and staged.device is not None:
            # Device extraction fetches ~8 B per match back through the
            # tunnel; on slow relays (measured ~30 MB/s D2H on bad days)
            # the host C++ hit scan over the staged HOST bytes wins at
            # every practical size.  The staging-bandwidth probe doubles
            # as the tunnel-health signal; host bytes always exist on a
            # staged handle, so this only chooses the faster scan.
            eng = self.searcher._engine
            try:
                fast_relay = eng._staging_is_fast()
            except Exception:
                fast_relay = True
            if not fast_relay:
                try:
                    eng._cpp_engine()
                    staged = None  # host path
                except Exception:
                    pass
        searcher = self.searcher
        machine = searcher.automaton
        case = searcher.case_sensitivity
        num_needles = searcher.num_needles
        min_priority = 1 - num_needles
        threshold = 1  # priorities are <= 0, so 1 keeps all matches

        if INCREMENTAL and num_needles and all(
            p.needle_length_bytes > 0 and p.needle_length_code_points > 0
            for _, p in searcher.needles
        ):
            result = self._run_incremental(data, max_length, min_priority, staged)
            if result is not _FALLBACK:
                if result is None:
                    return None
                return result.decode("utf-8") if as_str else result

        first = staged  # staged handle serves only the FIRST pass's scan
        while True:
            ms = searcher._engine.matches(first if first is not None else data, case)
            first = None
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
        # matches are the same needle).  removeOverlap: leftmost-wins within
        # the pass (Replacer.hs:191-198).
        kept_starts, kept_ends = _remove_overlap(starts, ends)
        # maxLength estimate over ALL matches of this priority (pre-dedup).
        repl_len = len(payload.needle_replacement)
        delta = int(np.sum(repl_len - (ends - starts)))
        return (p, payload, kept_starts, kept_ends), delta

    # -- incremental multi-pass engine -------------------------------------

    def _run_incremental(self, data: bytes, max_length: int, min_priority: int,
                         staged=None):
        """One full scan, then per-pass match-list patching.

        Exactness argument: a DFA match at end ``e`` depends only on the
        bytes of its own span (the automaton state warms up within the
        span).  So after splicing a pass's replacements, (a) every match
        not intersecting a replaced range survives verbatim, shifted by the
        cumulative splice delta; (b) every *new* match intersects a
        replaced range, and its span lies within ``maxlen-1`` bytes of it —
        rescanning merged windows around the splice sites from the root
        state finds exactly those.  The per-pass result therefore equals a
        full rescan (the reference's semantics, ``Replacer.hs:203-274``)
        while costing O(matches) instead of O(text).

        Returns the spliced bytes, None (max_length exceeded), or
        ``_FALLBACK`` when the scan mode is not eligible (lowered-stream
        IgnoreCase path, whose coordinate maps cannot be patched).
        """
        searcher = self.searcher
        case = searcher.case_sensitivity
        eng = searcher._engine
        # Decide eligibility BEFORE scanning: the non-composed IgnoreCase
        # path must not pay a full coordinate-map scan just to fall back.
        if case is IGNORE_CASE and eng._composed(case, data) is None:
            return _FALLBACK
        ms = eng.matches(staged if staged is not None else data, case)
        if case is IGNORE_CASE and ms.lowered is not None:
            return _FALLBACK  # defensive; _composed above should agree
        composed = case is IGNORE_CASE
        scan_machine = eng._ci.machine if composed else eng.machine
        maxlen = max(1, scan_machine.max_needle_bytes)
        values = searcher.automaton.values
        prio_of = np.fromiter((v.needle_priority for v in values), np.int64, len(values))
        lenb_of = np.fromiter((v.needle_length_bytes for v in values), np.int64, len(values))
        lencp_of = np.fromiter(
            (v.needle_length_code_points for v in values), np.int64, len(values)
        )

        ends = np.asarray(ms.ends, dtype=np.int64)
        vids = np.asarray(ms.value_ids, dtype=np.int64)
        prios = prio_of[vids]
        starts = self._starts_vectorized(data, ends, vids, lenb_of, lencp_of, composed)
        threshold = 1

        # Batched single-splice fast path: when no present replacement can
        # CREATE a match (its raw bytes are disjoint from every byte any
        # needle casing can contribute, and it is non-empty), the
        # sequential pass semantics collapse to per-priority selection over
        # the ORIGINAL match list followed by ONE multi-replacement splice
        # — the window rescans and per-pass text materializations vanish.
        if len(ends) and self._no_creation_eligible(np.unique(vids)):
            return self._run_batched(
                data, starts, ends, vids, prios, max_length, min_priority
            )

        data_bytes = data  # bytes twin of the working buffer (no-copy exits)

        while True:
            live = prios < threshold
            if not live.any():
                return data_bytes
            p = int(prios[live].max())
            sel = np.flatnonzero(prios == p)
            payload: Payload = values[int(vids[sel[0]])]
            repl = payload.needle_replacement
            repl_len = len(repl)
            # maxLength estimate over ALL matches of this priority, pre-dedup
            # (Replacer.hs:232-240).
            length_delta = int(np.sum(repl_len - (ends[sel] - starts[sel])))
            if len(data) + length_delta > max_length:
                return None
            # removeOverlap, leftmost-wins (Replacer.hs:191-198).
            k_starts, k_ends = _remove_overlap(starts[sel], ends[sel])
            new_data, data_bytes = _splice_owned(data, k_starts, k_ends, repl)
            if p == min_priority:
                return data_bytes
            threshold = p

            # -- patch the match list for the next pass --------------------
            deltas = repl_len - (k_ends - k_starts)
            shift = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(deltas)])
            new_r_starts = k_starts + shift[:-1]
            new_r_ends = new_r_starts + repl_len
            # Survivors: priority below the new threshold and not
            # intersecting any replaced [k_start, k_end) range.
            idx = np.searchsorted(k_ends, starts, side="right")
            idx_c = np.minimum(idx, len(k_starts) - 1)
            inter = (idx < len(k_starts)) & (k_starts[idx_c] < ends)
            keep = ~inter & (prios < threshold)
            kshift = shift[np.searchsorted(k_ends, starts[keep], side="right")]
            starts = starts[keep] + kshift
            ends = ends[keep] + kshift
            vids = vids[keep]
            prios = prios[keep]
            # Windows around each splice site, merged.
            w_b, w_e = _merge_windows(
                np.maximum(new_r_starts - (maxlen - 1), 0),
                np.minimum(new_r_ends + (maxlen - 1), len(new_data)),
            )
            if int(np.sum(w_e - w_b)) > len(new_data) // 2:
                # Windows cover most of the text: a full rescan is cheaper.
                ms2 = eng.matches(new_data, case)
                ends = np.asarray(ms2.ends, dtype=np.int64)
                vids = np.asarray(ms2.value_ids, dtype=np.int64)
                prios = prio_of[vids]
                keep2 = prios < threshold
                ends, vids, prios = ends[keep2], vids[keep2], prios[keep2]
                starts = self._starts_vectorized(
                    new_data, ends, vids, lenb_of, lencp_of, composed
                )
            else:
                n_ends, n_vids = self._scan_windows(scan_machine, new_data, w_b, w_e)
                n_prios = prio_of[n_vids]
                if composed:
                    # Vectorized start recovery (one text canonicalization;
                    # the per-match skip_code_points_backwards generator
                    # re-canonicalized the FULL text per match).
                    n_starts = utf8.raw_match_starts(
                        new_data, n_ends, lencp_of[n_vids]
                    )
                else:
                    n_starts = n_ends - lenb_of[n_vids]
                # Keep only genuinely-new matches: those intersecting a
                # replaced range (everything else is already carried).
                j = np.searchsorted(new_r_ends, n_starts, side="right")
                j_c = np.minimum(j, len(new_r_starts) - 1)
                fresh = (
                    (j < len(new_r_starts))
                    & (new_r_starts[j_c] < n_ends)
                    & (n_prios < threshold)
                )
                if fresh.any():
                    starts = np.concatenate([starts, n_starts[fresh]])
                    ends = np.concatenate([ends, n_ends[fresh]])
                    vids = np.concatenate([vids, n_vids[fresh]])
                    prios = np.concatenate([prios, n_prios[fresh]])
                    order = np.argsort(ends, kind="stable")
                    starts, ends = starts[order], ends[order]
                    vids, prios = vids[order], prios[order]
            data = new_data

    def _needle_byte_universe(self) -> frozenset:
        """Every byte that can appear inside a match of this replacer's
        scan machine: the needles' bytes (CaseSensitive) or the bytes of
        every case variant of every needle code point (IgnoreCase — the
        composed DFA transitions on raw bytes of any casing).  Cached."""
        u = getattr(self, "_byte_universe", None)
        if u is None:
            bs = set()
            ci = self.case_sensitivity is IGNORE_CASE
            for needle, _ in self.searcher.needles:
                text = needle.decode("utf-8", "surrogateescape") if isinstance(
                    needle, bytes
                ) else needle
                if not ci:
                    bs.update(utf8.to_bytes(text))
                    continue
                for ch in text:
                    for v in set(utf8.unlower_code_point(ch)) | {ch}:
                        bs.update(utf8.unicode2utf8(ord(v)))
            u = self._byte_universe = frozenset(bs)
        return u

    def _no_creation_eligible(self, present_vids) -> bool:
        """True when no present replacement can create a new match: every
        replacement is non-empty and shares no byte with the needle byte
        universe (a created match must include >= 1 replacement byte, which
        the scan machine then cannot step through)."""
        universe = self._needle_byte_universe()
        values = self.searcher.automaton.values
        for v in present_vids:
            repl = values[int(v)].needle_replacement
            if len(repl) == 0 or not universe.isdisjoint(repl):
                return False
        return True

    def _run_batched(self, data, starts, ends, vids, prios, max_length, min_priority):
        """Priority passes over the ORIGINAL match list (sound under
        ``_no_creation_eligible``): per pass, drop matches destroyed by
        earlier kept sites, leftmost-wins, accumulate; one final
        multi-replacement splice.  Bit-exact with the sequential loop —
        every pass's match set in the reference equals the carried
        original-coordinate set because replacements neither create
        matches (eligibility) nor move surviving ones (byte content
        outside replaced ranges is untouched; only offsets shift, and all
        selection logic here is order/overlap-based)."""
        values = self.searcher.automaton.values
        cur_len = len(data)
        kept_s: List[np.ndarray] = []
        kept_e: List[np.ndarray] = []
        kept_r: List[np.ndarray] = []
        # Merged kept-site intervals, maintained sorted by start.
        site_s = np.zeros(0, dtype=np.int64)
        site_e = np.zeros(0, dtype=np.int64)
        threshold = 1
        while True:
            live = prios < threshold
            if not live.any():
                break
            p = int(prios[live].max())
            sel = np.flatnonzero(prios == p)
            s_p, e_p = starts[sel], ends[sel]
            if len(site_s):
                # Destroyed: intersects an earlier kept site.
                idx = np.searchsorted(site_e, s_p, side="right")
                idx_c = np.minimum(idx, len(site_s) - 1)
                alive = ~((idx < len(site_s)) & (site_s[idx_c] < e_p))
                s_p, e_p = s_p[alive], e_p[alive]
            payload: Payload = values[int(vids[sel[0]])]
            repl_len = len(payload.needle_replacement)
            if len(s_p) == 0:
                threshold = p
                if p == min_priority:
                    break
                continue
            # maxLength estimate over this pass's matches pre-dedup
            # (Replacer.hs:232-240) against the CURRENT (virtual) length.
            if cur_len + int(np.sum(repl_len - (e_p - s_p))) > max_length:
                return None
            k_s, k_e = _remove_overlap(s_p, e_p)
            cur_len += len(k_s) * repl_len - int(np.sum(k_e - k_s))
            kept_s.append(k_s)
            kept_e.append(k_e)
            kept_r.append(np.full(len(k_s), int(vids[sel[0]]), dtype=np.int32))
            site_s, site_e = _merge_sites(site_s, site_e, k_s, k_e)
            if p == min_priority:
                break
            threshold = p
        if not kept_s:
            return data if isinstance(data, bytes) else utf8.to_bytes(data)
        all_s = np.concatenate(kept_s)
        all_e = np.concatenate(kept_e)
        all_r = np.concatenate(kept_r)
        order = np.argsort(all_s, kind="stable")
        return _splice_multi_bytes(
            data, all_s[order], all_e[order], all_r[order], values
        )

    @staticmethod
    def _starts_vectorized(data, ends, vids, lenb_of, lencp_of, composed):
        """Match starts for a full match list (one pass over the text)."""
        if not composed:
            return ends - lenb_of[vids]
        return utf8.raw_match_starts(data, ends, lencp_of[vids])

    def _scan_windows(self, scan_machine, data, w_b, w_e):
        """Segmented hit scan over merged windows (native when available).
        ``data`` may be bytes or np.uint8 (the incremental loop's working
        buffer)."""
        try:
            cpp = self._window_cpp
        except AttributeError:
            try:
                from .native.cpp_engine import CppAcEngine

                cpp = CppAcEngine(scan_machine)
            except Exception:
                cpp = None
            self._window_cpp = cpp
        if cpp is not None:
            return cpp.segments_matches_arrays(utf8.to_u8(data), w_b, w_e)
        return _scan_segments_py(scan_machine, data, w_b, w_e)


#: Sentinel: the incremental engine declined (ineligible scan mode) and the
#: caller should run the full-rescan loop instead.
_FALLBACK = object()


def _native_lib():
    # utf8's loader caches and honors AMT_NO_NATIVE.
    return utf8._native_lib()


def _splice_threads() -> int:
    from .native.cpp_engine import _default_threads

    return _default_threads()


_PYBYTES_FNS = None


def _alloc_bytes(n: int):
    """A fresh uninitialized Python ``bytes`` of length ``n`` plus its
    writable data pointer (``PyBytes_FromStringAndSize(NULL, n)`` — filled
    by the caller BEFORE the object escapes; refcount 1, the standard
    build-then-expose C-API pattern).  Prototypes are configured once."""
    import ctypes

    global _PYBYTES_FNS
    if _PYBYTES_FNS is None:
        make = ctypes.pythonapi.PyBytes_FromStringAndSize
        make.restype = ctypes.py_object
        make.argtypes = [ctypes.c_char_p, ctypes.c_ssize_t]
        asstr = ctypes.pythonapi.PyBytes_AsString
        asstr.restype = ctypes.c_void_p
        asstr.argtypes = [ctypes.py_object]
        _PYBYTES_FNS = (make, asstr)
    make, asstr = _PYBYTES_FNS
    buf = make(None, n)
    return buf, asstr(buf)


def _splice_owned(data, starts: np.ndarray, ends: np.ndarray, replacement: bytes):
    """Splice straight into a Python ``bytes`` object and return
    ``(np_view, bytes_obj)`` — the view for further passes, the object for
    the final return.  The buffer comes from
    ``PyBytes_FromStringAndSize(NULL, n)`` and is filled by the native
    threaded memcpy loop BEFORE the object escapes (refcount 1: the
    standard build-then-expose C-API pattern), so the multi-pass loop never
    pays a tobytes copy at any exit."""
    lib = _native_lib()
    if lib is None or len(starts) == 0:
        out = _splice_np(data, starts, ends, replacement)
        b = out.tobytes()
        return np.frombuffer(b, dtype=np.uint8), b
    src = utf8.to_u8(data)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    repl = np.frombuffer(replacement, dtype=np.uint8)
    out_len = len(src) + len(starts) * len(repl) - int(np.sum(ends - starts))
    if out_len <= 0:
        return np.zeros(0, dtype=np.uint8), b""
    buf, ptr = _alloc_bytes(out_len)
    wrote = int(
        lib.am_splice_mt(
            src.ctypes.data, len(src), starts.ctypes.data, ends.ctypes.data,
            len(starts), repl.ctypes.data, len(repl), ptr,
            _splice_threads(),
        )
    )
    assert wrote == out_len, (wrote, out_len)
    return np.frombuffer(buf, dtype=np.uint8), buf


def _remove_overlap(starts: np.ndarray, ends: np.ndarray):
    """Leftmost-wins overlap removal on end-sorted matches
    (``removeOverlap``, ``Replacer.hs:191-198``)."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    lib = _native_lib()
    if lib is not None and len(starts):
        ks = np.empty(len(starts), dtype=np.int64)
        ke = np.empty(len(starts), dtype=np.int64)
        k = int(
            lib.am_remove_overlap(
                starts.ctypes.data, ends.ctypes.data, len(starts), ks.ctypes.data, ke.ctypes.data
            )
        )
        return ks[:k], ke[:k]
    kept_s: List[int] = []
    kept_e: List[int] = []
    prev_end = -1
    for s, e in zip(starts, ends):
        if s >= prev_end:
            kept_s.append(int(s))
            kept_e.append(int(e))
            prev_end = int(e)
    return np.asarray(kept_s, dtype=np.int64), np.asarray(kept_e, dtype=np.int64)


def _merge_sites(a_s, a_e, b_s, b_e):
    """Union of two sorted, mutually disjoint interval sets, sorted by
    start (disjointness makes start order == end order)."""
    s = np.concatenate([a_s, b_s])
    e = np.concatenate([a_e, b_e])
    o = np.argsort(s, kind="stable")
    return s[o], e[o]


def _splice_multi_bytes(data, starts, ends, rids, values) -> bytes:
    """One splice with a per-site replacement (the batched fast path's
    final materialization), straight into a Python bytes object."""
    src = utf8.to_u8(data)
    uniq, inv = np.unique(rids, return_inverse=True)
    blobs = [values[int(v)].needle_replacement for v in uniq]
    off = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(np.fromiter((len(b) for b in blobs), np.int64, len(blobs)), out=off[1:])
    lens = off[inv + 1] - off[inv]
    out_len = int(len(src) + lens.sum() - np.sum(ends - starts))
    lib = _native_lib()
    if lib is None:
        parts: List[bytes] = []
        prev = 0
        sb = src.tobytes()
        for s, e, i in zip(starts, ends, inv):
            parts.append(sb[prev:s])
            parts.append(blobs[int(i)])
            prev = int(e)
        parts.append(sb[prev:])
        return b"".join(parts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    rid32 = np.ascontiguousarray(inv, dtype=np.int32)
    blob = np.frombuffer(b"".join(blobs) or b"\x00", dtype=np.uint8)
    if out_len <= 0:
        return b""
    buf, ptr = _alloc_bytes(out_len)
    wrote = int(
        lib.am_splice_multi(
            src.ctypes.data, len(src), starts.ctypes.data, ends.ctypes.data,
            len(starts), blob.ctypes.data, off.ctypes.data, rid32.ctypes.data,
            ptr, _splice_threads(),
        )
    )
    assert wrote == out_len, (wrote, out_len)
    return buf


def _merge_windows(begin: np.ndarray, end: np.ndarray):
    """Merge sorted, possibly overlapping [begin, end) windows (vectorized)."""
    hi = np.maximum.accumulate(end)
    new_seg = np.concatenate([[True], begin[1:] > hi[:-1]])
    return begin[new_seg], np.maximum.reduceat(end, np.flatnonzero(new_seg))


def _scan_segments_py(machine, data: bytes, seg_b, seg_e):
    """Scalar segmented hit scan (native-library fallback)."""
    delta, mc = machine.delta, machine.match_count
    ends: List[int] = []
    vids: List[int] = []
    for b, e in zip(seg_b, seg_e):
        s = 0
        for i in range(int(b), int(e)):
            s = delta[s, data[i]]
            if mc[s]:
                for v in machine.outputs(int(s)):
                    ends.append(i + 1)
                    vids.append(int(v))
    return np.asarray(ends, dtype=np.int64), np.asarray(vids, dtype=np.int64)


def _splice_np(data, starts: np.ndarray, ends: np.ndarray, replacement: bytes) -> np.ndarray:
    """Replace non-overlapping [start, end) ranges (``replace``,
    ``Replacer.hs:163-180``): one output allocation, native memcpy loop
    when the helper library is available.  Accepts bytes or np.uint8 and
    returns np.uint8 WITHOUT a bytes materialization — the incremental
    multi-pass loop splices several times per run, and a per-pass
    ``tobytes`` copy was the single largest cost at config-4 densities."""
    src = utf8.to_u8(data)
    if len(starts) == 0:
        return src
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    repl = np.frombuffer(replacement, dtype=np.uint8)
    out_len = len(src) + len(starts) * len(repl) - int(np.sum(ends - starts))
    out = np.empty(max(out_len, 1), dtype=np.uint8)
    lib = _native_lib()
    if lib is not None:
        wrote = int(
            lib.am_splice_mt(
                src.ctypes.data,
                len(src),
                starts.ctypes.data,
                ends.ctypes.data,
                len(starts),
                repl.ctypes.data,
                len(repl),
                out.ctypes.data,
                _splice_threads(),
            )
        )
        return out[:wrote]
    w = 0
    prev = 0
    for s, e in zip(starts, ends):
        seg = src[prev:s]
        out[w : w + len(seg)] = seg
        w += len(seg)
        out[w : w + len(repl)] = repl
        w += len(repl)
        prev = int(e)
    seg = src[prev:]
    out[w : w + len(seg)] = seg
    return out[: w + len(seg)]


def _splice(data: bytes, starts: np.ndarray, ends: np.ndarray, replacement: bytes) -> bytes:
    """bytes-in/bytes-out wrapper of :func:`_splice_np` (the full-rescan
    loop's splice; the incremental loop uses the np form directly)."""
    if len(starts) == 0:
        return data if isinstance(data, bytes) else utf8.to_bytes(data)
    return _splice_np(data, starts, ends, replacement).tobytes()


__all__ = ["Replacer", "Payload", "MAX_BOUND"]
