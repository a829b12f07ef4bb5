"""Engine dispatch: one semantic contract, several execution backends.

Every high-level operation (Searcher/Replacer/Splitter) funnels through a
``MatchEngine``, which runs the dense byte-DFA over a haystack and returns
match end positions (raw byte coordinates) + value ids. Backends:

* ``python`` — the scalar oracle (``models.ac.run_with_case``), exact and
  slow; used for tiny inputs and as the conformance reference.
* ``xla``    — batched ``lax.scan`` gather loop (``ops.xla_scan``), jittable,
  runs on CPU or one TPU chip.
* ``pallas`` — hand-written TPU kernel (``ops.pallas_scan``), the bytes/s
  workhorse. Falls back to ``xla`` off-TPU.
* ``auto``   — pick by input size and available hardware.

IgnoreCase strategy (design delta vs the reference, SURVEY.md §7.1): instead
of decoding + lowering each code point inside the hot loop
(``AhoCorasick/Automaton.hs:468-480``), the streaming lowering transducer is
**composed with the match DFA at build time** (``models.case_dfa``) so scans
run directly on the RAW bytes — IgnoreCase at full CaseSensitive speed, with
natively raw match coordinates.  When composition is unavailable (automaton
above the ``AMT_COMPOSED_CI`` state gate, or needles that are not whole code
points) the fallback lowers the haystack up front with a vectorized
byte-stream transducer (``utils.utf8.lower_transform``) that carries
raw-byte coordinate maps, scans the lowered stream case-sensitively, and
maps positions back to raw coordinates.  Either way the per-byte device
loop is a pure gather.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import os

import numpy as np

from .models import ac
from .utils import config, utf8
from .utils.case import CASE_SENSITIVE, IGNORE_CASE, CaseSensitivity

#: Inputs smaller than this run on the scalar python path under "auto"
#: (device dispatch overhead dominates below it).
AUTO_PYTHON_THRESHOLD = 4096

#: Under "auto" on TPU hosts, one-shot inputs below this size stay on the
#: host C++ engine.  Break-even vs the ~2.5-6 GB/s interleaved host engine:
#: the device wins when n/host_rate exceeds launch + transfer + n/165G,
#: i.e. n > launch_latency * host_rate ≈ 3 MiB at ~1 ms real-host launch
#: latency; 8 MiB is conservatively above that.  Hosts with slow staging
#: links are routed to the host engine separately (_staging_is_fast), so
#: this constant only needs to cover the fast-PCIe case.
AUTO_DEVICE_THRESHOLD = 8 << 20

_VALID_ENGINES = ("auto", "python", "xla", "pallas", "cpp")

#: Lazily measured host->device staging bandwidth (see
#: MatchEngine._staging_is_fast).
_STAGING_BPS = None


def _has_device(text) -> bool:
    return isinstance(text, StagedHaystack) and text.device is not None


def _jax_backend() -> str:
    """The default JAX backend, or "none" when the JAX runtime cannot
    initialize at all (missing accelerator plugin, dead relay): the
    dispatcher then serves from the jax-free host engines instead of
    crashing."""
    try:
        import jax

        return jax.default_backend()
    except Exception:
        return "none"


@dataclass
class StagedHaystack:
    """A haystack prepared for repeated scans (see ``MatchEngine.stage``).

    Pass it anywhere a haystack is accepted; operations reuse the lowered
    bytes and (on device backends) the staged device streams instead of
    re-transferring per call.
    """

    case: CaseSensitivity
    data: np.ndarray  # scan bytes (lowered under non-composed IGNORE_CASE)
    lowered: Optional[utf8.LoweredText]
    device: object = None  # backend staging handle (StagedStreams)
    #: True when prepared by the composed case-DFA engine: ``data`` is the
    #: RAW bytes and the staging belongs to the composed machine's backends.
    composed: bool = False
    #: The machine whose engine staged this haystack (identity-checked so a
    #: staged haystack cannot silently be scanned by a different searcher).
    owner: object = None

    def __len__(self) -> int:
        return len(self.data)


@dataclass
class MatchSet:
    """All matches of one scan, in emission order.

    ends:      int64 [m] byte index one past each match end (raw coords)
    value_ids: int32 [m] index into the machine's values list
    lowered:   the LoweredText used (IgnoreCase only), for start recovery
    """

    ends: np.ndarray
    value_ids: np.ndarray
    lowered: Optional[utf8.LoweredText]

    def __len__(self) -> int:
        return len(self.ends)


class MatchEngine:
    """Executes a machine over haystacks with a selectable backend."""

    def __init__(self, machine: ac.AcMachine, engine: str = "auto"):
        if engine == "auto":
            engine = config.DEFAULT.engine  # AMT_ENGINE override, still "auto" by default
        if engine not in _VALID_ENGINES:
            raise ValueError(f"unknown engine {engine!r}; expected one of {_VALID_ENGINES}")
        self.machine = machine
        self.engine = engine
        self._validate = config.DEFAULT.validate
        self._xla = None
        self._pallas = None
        self._cpp = None
        self._ci = False  # False = not yet tried; None = unavailable

    # -- composed IgnoreCase engine ---------------------------------------

    #: Haystack size from which an IgnoreCase scan triggers building the
    #: composed case DFA.  Composition costs ~0.1-0.5 s for small needle
    #: sets (more than one lowering pass at this size), but it is cached on
    #: the engine and searchers are built to be reused (the reference's
    #: whole design): bulk-scan workloads amortize it within a few scans,
    #: and every later scan runs at CaseSensitive speed with no lowering.
    #: Tiny ad-hoc scans stay on the cheap lowering path.
    AUTO_COMPOSE_BYTES = 4 << 20

    def _composed(self, case: CaseSensitivity, text=None) -> Optional["MatchEngine"]:
        """The composed case-folding engine for IGNORE_CASE scans, or None.

        Built lazily: composing the strict lowering transducer with the
        match DFA (``models.case_dfa``) yields a raw-byte machine scanned
        CaseSensitively — removing the per-scan host lowering pass entirely
        and making match coordinates natively raw.  Composition costs
        ~O(n_states) host time once, so it is triggered by repeated-scan
        intent (``stage``) or a large one-shot input, and gated by
        ``AMT_COMPOSED_CI`` (max automaton states) and needle eligibility
        (whole-code-point needles).

        ``text=None`` forces the build (staging); a ``StagedHaystack``
        delegates only if it was staged through the composed path.
        """
        if case is not IGNORE_CASE:
            return None
        if isinstance(text, StagedHaystack):
            if text.composed and self._ci and text.owner is self._ci.machine:
                return self._ci
            return None
        if self._ci is False:
            if text is not None and len(text) < self.AUTO_COMPOSE_BYTES:
                return None  # not yet worth building; retry on larger input
            self._ci = None
            m = self.machine
            if m.n_states <= config.DEFAULT.composed_ci_max_states:
                from .models import case_dfa

                try:
                    if case_dfa.eligible(m.needles):
                        cm = case_dfa.compose_build(
                            list(zip(m.needles, m.values)), machine=m
                        )
                        self._ci = MatchEngine(cm, self.engine)
                except Exception:
                    self._ci = None
        return self._ci

    # -- backend selection -------------------------------------------------

    def _xla_engine(self):
        if self._xla is None:
            from .ops.xla_scan import XlaAcEngine

            self._xla = XlaAcEngine(self.machine)
        return self._xla

    def _cpp_engine(self):
        if self._cpp is None:
            from .native import cpp_engine

            self._cpp = cpp_engine.CppAcEngine(self.machine)
        return self._cpp

    def _pallas_engine(self):
        if self._pallas is None:
            if _jax_backend() not in ("tpu", "axon"):
                # Mosaic kernels need TPU hardware; honor the documented
                # fallback instead of erroring on CPU-only hosts.
                return self._xla_engine()
            from .ops.comb_scan import make_pallas_engine
            from .ops.pallas_scan import CapacityError

            try:
                # Cheaper of the dense select-chain and comb-compressed
                # kernels for single-pass machines.
                self._pallas = make_pallas_engine(self.machine)
            except CapacityError:
                # Automaton too big for one VMEM table: needle-grouped
                # multi-pass kernel (ops.grouped).
                from .ops.grouped import GroupedPallasAcEngine

                try:
                    self._pallas = GroupedPallasAcEngine(self.machine)
                except CapacityError:
                    # Not partitionable either (empty-needle machines: the
                    # root-piggyback count is a union over groups, which
                    # per-group sums cannot express).  The XLA engine scans
                    # the FULL machine — correct at any table size.
                    return self._xla_engine()
        return self._pallas

    #: Under "auto", automata whose group passes sum to more than this many
    #: physical table rows run on the multithreaded C++ engine instead: the
    #: kernel's sustained rate is ~165/rows GB/s per pass (gather-bound
    #: select chain), while the interleaved host engine sustains ~2.5-3
    #: GB/s on mid-tier automata — past ~56 summed rows the host wins.
    AUTO_MAX_TOTAL_ROWS = 56

    def _pallas_total_rows(self) -> int:
        """Summed physical rows across the adaptive group plan (1 group for
        machines that fit a single pass); effectively infinite when even
        grouping cannot fit (giant single needles)."""
        if not hasattr(self, "_pallas_rows"):
            from .ops.comb_scan import plan_pallas
            from .ops.grouped import partition_adaptive
            from .ops.pallas_scan import CapacityError

            try:
                _, rows = plan_pallas(self.machine)
                self._pallas_rows = rows
            except CapacityError:
                try:
                    _, group_rows = partition_adaptive(self.machine, with_rows=True)
                    self._pallas_rows = sum(group_rows)
                except CapacityError:
                    self._pallas_rows = 1 << 30
        return self._pallas_rows

    def _staging_is_fast(self) -> bool:
        """Measured host->device bandwidth class (once per process).

        One-shot device scans must pay the corpus transfer; on a tunneled
        relay that runs at ~60 MB/s (measured here), so host engines win
        every one-shot scan regardless of size.  On a real TPU host PCIe
        staging is multi-GB/s and the device wins past the size threshold.
        Override with AMT_STAGING_MBPS.
        """
        global _STAGING_BPS
        if _STAGING_BPS is None:
            env = os.environ.get("AMT_STAGING_MBPS")
            if env:
                _STAGING_BPS = float(env) * 1e6
            else:
                import time

                import jax

                buf = np.zeros(8 << 20, dtype=np.uint8)
                np.asarray(jax.device_put(buf)[:1])  # warm the path
                t0 = time.perf_counter()
                # Materialize one element: device_put completion without a
                # full round-trip readback (block_until_ready is not
                # trustworthy on the tunneled relay).
                np.asarray(jax.device_put(buf)[:1])
                _STAGING_BPS = len(buf) / (time.perf_counter() - t0)
        return _STAGING_BPS >= 1e9

    def _prefilter(self):
        """The native 5-byte-window prefilter engine when it beats the
        interleaved DFA: large needle sets (the DFA tables blow the caches)
        on hosts with enough cores to feed the filter, all needles >= 5
        bytes.  AMT_PREFILTER=1 forces it on, =0 off."""
        if not hasattr(self, "_pf"):
            self._pf = None
            force = os.environ.get("AMT_PREFILTER")
            auto = (
                force is None
                and len(self.machine.needles) >= 2000
                and (os.cpu_count() or 1) >= 8
            )
            # NEVER on a composed case-folding machine: its .needles are
            # the original-case needles while the delta does the folding —
            # byte-exact prefiltering would silently turn IGNORE_CASE into
            # CaseSensitive results.
            if getattr(self.machine, "composed_ci", False):
                return None
            if force == "1" or auto:
                try:
                    from .native.prefilter import PrefilterEngine, eligible

                    if eligible(self.machine.needles):
                        self._pf = PrefilterEngine(self.machine.needles)
                except Exception:
                    self._pf = None
        return self._pf

    def _stream_scanner(self, n_bytes: int):
        """Out-of-core streaming scanner when the input exceeds the staged
        HBM budget (2x AMT_STREAM_CHUNK_MB), else None.  Chunked staging
        keeps device memory constant and sidesteps giant one-shot
        host->device transfers (ops.streaming)."""
        limit = 2 * config.DEFAULT.stream_chunk_mb << 20
        if n_bytes <= limit:
            return None
        from .ops.streaming import StreamingScanner

        eng = self._pallas_engine()
        if not hasattr(eng, "count_staged"):
            return None  # xla fallback engine: no staged scan surface
        return StreamingScanner(
            eng, self.machine, chunk_bytes=config.DEFAULT.stream_chunk_mb << 20
        )

    def _pick(self, n_bytes: int, staged: bool = False) -> str:
        if self.engine != "auto":
            return self.engine
        if n_bytes < AUTO_PYTHON_THRESHOLD:
            return "python"
        backend = _jax_backend()
        if backend == "none":
            # JAX runtime unusable: host engines only.
            try:
                self._cpp_engine()
                return "cpp"
            except Exception:
                return "python"
        if backend in ("tpu", "axon"):
            # The Pallas kernel dominates the XLA scan on real TPU hardware
            # (~165 GB/s vs ~0.4 GB/s XLA-scan measured), but (a) per-launch overhead
            # makes it a loss below ~1 MiB, (b) its rate divides by the
            # needle-group pass count for huge automata, and (c) a one-shot
            # scan pays the host->device corpus transfer, which on slow
            # staging links loses to the host C++ engine at every size.
            if staged and self._pallas_total_rows() <= self.AUTO_MAX_TOTAL_ROWS:
                return "pallas"
            if (
                n_bytes >= AUTO_DEVICE_THRESHOLD
                and self._pallas_total_rows() <= self.AUTO_MAX_TOTAL_ROWS
            ):
                try:
                    self._cpp_engine()
                except Exception:
                    return "pallas"
                if self._staging_is_fast():
                    return "pallas"
                return "cpp"
            try:
                self._cpp_engine()
                return "cpp"
            except Exception:
                return "pallas" if self._pallas_total_rows() < (1 << 30) else "xla"
        # Non-accelerator JAX backends (plain CPU installs): the interleaved
        # host engine dominates the per-byte lax.scan gather loop by ~10-100x.
        try:
            self._cpp_engine()
            return "cpp"
        except Exception:
            return "xla"

    # -- prep --------------------------------------------------------------

    def _prep(self, text: utf8.TextLike, case: CaseSensitivity, need_coords: bool = True):
        """Return (scan_bytes, lowered or None).  ``need_coords=False``
        (counting / existence) skips the raw-coordinate maps — a ~3x
        cheaper IgnoreCase transducer pass."""
        if isinstance(text, StagedHaystack):
            if text.composed:
                # Composed-CI staged haystacks are only valid inside their
                # owning composed engine (raw bytes + that machine's device
                # staging); anywhere else the raw bytes would silently be
                # scanned as if they were lowered bytes.
                if case is CASE_SENSITIVE and text.owner is self.machine:
                    return text.data, text.lowered
                raise ValueError("staged haystack belongs to a different searcher")
            if text.owner is not None and text.owner is not self.machine:
                # Staged streams carry THIS machine's overlap/window plan; a
                # different searcher scanning them would silently miss
                # matches spanning chunk boundaries.
                raise ValueError("staged haystack belongs to a different searcher")
            if text.case is not case:
                raise ValueError("staged haystack was prepared for a different case mode")
            return text.data, text.lowered
        if case is IGNORE_CASE:
            lt = utf8.lower_transform(text, need_coords=need_coords)
            return lt.lowered, lt
        return utf8.to_u8(text), None

    def stage(self, text: utf8.TextLike, case: CaseSensitivity) -> "StagedHaystack":
        """Prepare a haystack once for repeated scans: case lowering and —
        on device backends — the HBM-resident stream layout are computed
        here and reused by every subsequent operation.

        TPU-native extension (the reference re-scans `Text` values; a
        device framework wants the host->device staging amortized)."""
        ci = self._composed(case)
        if ci is not None:
            staged = ci.stage(text, CASE_SENSITIVE)
            staged.case = case  # user-visible contract: staged for IGNORE_CASE
            staged.composed = True
            return staged
        data, lt = self._prep(text, case)
        staged = StagedHaystack(case=case, data=data, lowered=lt, owner=self.machine)
        over_budget = len(data) > 2 * config.DEFAULT.stream_chunk_mb << 20
        if not over_budget and self._pick(len(data), staged=True) == "pallas":
            eng = self._pallas_engine()
            if hasattr(eng, "stage"):
                staged.device = eng.stage(data)
            elif hasattr(eng, "_stage"):  # grouped engine
                staged.device = eng._stage(data)
        # Over the streaming budget the haystack is NOT resident: scans on
        # this handle go through the chunked StreamingScanner (constant
        # device memory) instead of a whole-corpus HBM upload that may not
        # fit; the case lowering above is still amortized across scans.
        return staged

    def adopt_staged(
        self, st: "StagedHaystack", case: CaseSensitivity
    ) -> "StagedHaystack":
        """Rebind another searcher's staged haystack to THIS engine — the
        live needle-set-swap path: the corpus's device streams (and, for
        IgnoreCase, its host lowering) are reused instead of re-paying the
        host->device transfer and the lowering pass.  The stream layout is
        machine-independent; per-machine boundary scalars re-derive on the
        fly (``ops.pallas_scan.PallasAcEngine.adopt_staged`` validates the
        layout/overlap and the grouped passes already rely on the same
        argument).  Falls back to restaging the device streams from the
        staged bytes when the layouts are incompatible (still skips any
        lowering).  Raises ValueError only for the one impossible
        direction: a lowered (non-composed IgnoreCase) staging cannot feed
        an engine that scans raw bytes, because the raw bytes are gone.
        """
        ci = self._composed(case)
        if ci is not None:
            # Composed-CI scans RAW bytes: adoptable from any raw staging
            # (CaseSensitive or composed).
            if st.case is CASE_SENSITIVE or st.composed:
                new = ci.adopt_staged(st, CASE_SENSITIVE)
                new.case = case
                new.composed = True
                return new
            raise ValueError(
                "cannot adopt a lowered (non-composed IgnoreCase) staging "
                "into a composed-CI searcher: the raw bytes are not retained"
            )
        need_lowered = case is IGNORE_CASE
        have_lowered = st.case is IGNORE_CASE and not st.composed
        if need_lowered != have_lowered:
            if need_lowered and not have_lowered:
                # Raw staging -> lowering engine: lower the raw bytes (the
                # device streams hold raw bytes and cannot be reused).
                return self.stage(st.data, case)
            raise ValueError(
                "cannot adopt a lowered staging into a CaseSensitive "
                "searcher: the raw bytes are not retained"
            )
        new = StagedHaystack(
            case=case, data=st.data, lowered=st.lowered, owner=self.machine
        )
        over_budget = len(st.data) > 2 * config.DEFAULT.stream_chunk_mb << 20
        if not over_budget and self._pick(len(st.data), staged=True) == "pallas":
            eng = self._pallas_engine()
            adopted = (
                eng.adopt_staged(st.device)
                if hasattr(eng, "adopt_staged")
                else None
            )
            if adopted is not None:
                new.device = adopted
            elif hasattr(eng, "stage"):
                new.device = eng.stage(st.data)
            elif hasattr(eng, "_stage"):
                new.device = eng._stage(st.data)
        return new

    # -- operations --------------------------------------------------------

    def count(self, text: utf8.TextLike, case: CaseSensitivity) -> int:
        ci = self._composed(case, text)
        if ci is not None:
            return ci.count(text, CASE_SENSITIVE)
        data, _ = self._prep(text, case, need_coords=False)
        backend = self._pick(len(data), staged=_has_device(text))
        if backend == "python":
            # Scan the pre-lowered bytes case-sensitively: identical result.
            return ac.count_matches(self.machine, data, CASE_SENSITIVE)
        if backend == "cpp":
            pf = self._prefilter()
            if pf is not None:
                return pf.count(data)
            return self._cpp_engine().count(data)
        if backend == "pallas":
            eng = self._pallas_engine()
            st = text.device if isinstance(text, StagedHaystack) else None
            if st is not None and hasattr(eng, "count_staged"):
                got = eng.count_staged(st)
            else:
                sc = self._stream_scanner(len(data))
                got = sc.count(data) if sc is not None else eng.count(data)
        else:
            got = self._xla_engine().count(data)
        if self._validate:
            # AMT_VALIDATE: cross-check device results against the native
            # engine (debug analogue of the reference's bounds-checked era,
            # Automaton.hs:382-392).
            ref = self._cpp_engine().count(data)
            assert got == ref, f"device count {got} != native {ref}"
        return got

    def contains_any(self, text: utf8.TextLike, case: CaseSensitivity) -> bool:
        ci = self._composed(case, text)
        if ci is not None:
            return ci.contains_any(text, CASE_SENSITIVE)
        data, _ = self._prep(text, case, need_coords=False)
        backend = self._pick(len(data), staged=_has_device(text))
        if backend == "python":
            def first(_acc, _m):
                return ac.Done(True)

            return bool(ac.run_text(False, first, self.machine, data))
        if backend == "cpp":
            # Host early exit: stop at the first hit (Done True semantics).
            pf = self._prefilter()
            if pf is not None:
                return pf.first_hit(data) >= 0
            return self._cpp_engine().first_hit(data) >= 0
        if backend == "pallas":
            from .ops.pallas_scan import CapacityError

            eng = self._pallas_engine()
            if hasattr(eng, "contains_staged"):
                # Absorbing-state existence kernel: ~2 fewer vector ops per
                # byte than counting (falls back if the sticky table's extra
                # state overflows the kernel capacity).
                try:
                    st = text.device if isinstance(text, StagedHaystack) else None
                    if st is not None:
                        if hasattr(eng, "contains_staged_early"):
                            # Segment grid with async dispatch: first-MB
                            # hits answer in ~1/K of the full-scan wall;
                            # auto-sizes to 1 segment for small corpora.
                            return eng.contains_staged_early(st)
                        return eng.contains_staged(st)
                    sc = self._stream_scanner(len(data))
                    if sc is not None:
                        return sc.contains(data)
                    return eng.contains(data)
                except CapacityError:
                    pass
            # Sticky-table overflow fallback: still honor the out-of-core
            # streaming budget instead of one-shot staging the whole corpus.
            sc = self._stream_scanner(len(data))
            if sc is not None:
                return sc.count(data) > 0
            return eng.count(data) > 0
        return self._xla_engine().count(data) > 0

    def matches(self, text: utf8.TextLike, case: CaseSensitivity) -> MatchSet:
        """All matches with raw-coordinate end positions, emission order."""
        ci = self._composed(case, text)
        if ci is not None:
            # Raw-byte scan on the composed machine: ends are already raw,
            # MatchSet.lowered stays None (consumers recover starts with
            # utf8.raw_match_starts).
            return ci.matches(text, CASE_SENSITIVE)
        data, lt = self._prep(text, case)
        backend = self._pick(len(data), staged=_has_device(text))
        eng = None
        if backend == "pallas":
            eng = self._pallas_engine()
            st = text.device if isinstance(text, StagedHaystack) else None
            if st is not None and hasattr(eng, "matches_arrays_staged"):
                ends, value_ids = eng.matches_arrays_staged(st)
                if lt is not None and len(ends):
                    ends = lt.map_ends_to_raw(ends)
                return MatchSet(ends=ends, value_ids=value_ids, lowered=lt)
            if hasattr(eng, "matches_arrays"):  # device extraction / grouped
                sc = self._stream_scanner(len(data))
                if sc is not None:
                    ends, value_ids = sc.matches_arrays(data)
                else:
                    ends, value_ids = eng.matches_arrays(data)
                if lt is not None and len(ends):
                    ends = lt.map_ends_to_raw(ends)
                return MatchSet(ends=ends, value_ids=value_ids, lowered=lt)
        if backend == "cpp":
            # Hit-only native scan: no per-position state array round-trip.
            ends, value_ids = self._cpp_engine().matches_arrays(data)
            if lt is not None and len(ends):
                ends = lt.map_ends_to_raw(ends)
            return MatchSet(ends=ends, value_ids=value_ids, lowered=lt)
        if backend == "python":
            states = self._python_states(data)
        elif backend == "pallas":
            states = eng.final_states(data)
        else:
            states = self._xla_engine().final_states(data)
        from .ops.xla_scan import extract_matches

        ends, value_ids = extract_matches(self.machine, states)
        if lt is not None and len(ends):
            ends = lt.map_ends_to_raw(ends)
        return MatchSet(ends=ends, value_ids=value_ids, lowered=lt)

    def value_presence(self, text: utf8.TextLike, case: CaseSensitivity) -> np.ndarray:
        """bool [n_values]: which values have at least one match."""
        ci = self._composed(case, text)
        if ci is not None:
            return ci.value_presence(text, CASE_SENSITIVE)
        data, _ = self._prep(text, case, need_coords=False)
        m = self.machine
        backend = self._pick(len(data), staged=_has_device(text))
        if backend == "xla":
            hits = self._xla_engine().state_hits(data)
            hit_states = np.flatnonzero(hits)
        elif backend == "cpp":
            # Native presence scan with the containsAll early exit: stops
            # as soon as every value has been seen.
            return self._cpp_engine().value_presence(data, len(m.values))
        else:
            if backend == "pallas":
                eng = self._pallas_engine()
                if hasattr(eng, "value_presence"):  # grouped multi-pass engine
                    return eng.value_presence(data, len(m.values))
                bitap = getattr(eng, "bitap", None)
                st = None  # staged once, shared by both staged paths below
                if bitap is not None:
                    # ONE sticky bitap scan: each track's end bit is a
                    # per-needle flag (value ids align with needle entries).
                    # None = a CI trap fired (flags could under-report);
                    # fall through to the dense compaction path.
                    st = text.device if _has_device(text) else eng.stage(data)
                    pres = eng.needle_presence_staged(st)
                    if pres is not None:
                        return pres
                if hasattr(eng, "match_positions_staged"):
                    # Device-side compaction: only hit states come back;
                    # reuse the staged device streams when given.
                    if st is None:
                        st = text.device if _has_device(text) else eng.stage(data)
                    _, hit = eng.match_positions_staged(st)
                    return ac.presence_of_states(m, hit, len(m.values))
                states = eng.final_states(data)
            else:
                states = self._python_states(data)
            hit_states = np.unique(states[m.match_count[states] > 0])
        return ac.presence_of_states(m, hit_states, len(m.values))

    def _python_states(self, data: np.ndarray) -> np.ndarray:
        """Scalar byte-DFA pass emitting the state after every byte."""
        delta = self.machine.delta
        out = np.empty(len(data), dtype=np.int32)
        state = 0
        dview = memoryview(utf8.to_bytes(data))
        for i, b in enumerate(dview):
            state = delta[state, b]
            out[i] = state
        return out


__all__ = ["MatchEngine", "MatchSet", "AUTO_PYTHON_THRESHOLD"]
