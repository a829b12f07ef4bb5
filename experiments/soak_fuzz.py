"""Differential soak: random needle sets/corpora across engine paths.

Compares, per trial: scalar oracle count vs C++ engine vs comb16
(interpret) vs grouped-fused (interpret) vs distributed mesh (xla inner),
plus matches_arrays parity on one path. Runs until killed; prints one
line per trial batch; any mismatch raises loudly.
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from alfred_margaret_tpu.models import ac
from alfred_margaret_tpu.native.cpp_engine import CppAcEngine
from alfred_margaret_tpu.ops.comb16_scan import Comb16PallasAcEngine
from alfred_margaret_tpu.ops.grouped import GroupedPallasAcEngine
from alfred_margaret_tpu.ops.pallas_scan import CapacityError
from alfred_margaret_tpu.parallel import DistributedAcEngine, make_mesh

t0 = time.time()
trial = 0
MAX_TRIALS = int(os.environ.get("AMT_SOAK_TRIALS", "0"))  # 0 = forever
SEED_BASE = int(os.environ.get("AMT_SOAK_SEED_BASE", "1000"))  # fresh ground per run
MESH = make_mesh(jax.devices()[:4], data=2, seq=1, needle=2)
MESH_DATA = make_mesh(jax.devices()[:4], data=4, seq=1, needle=1)
while True:
    if MAX_TRIALS and trial >= MAX_TRIALS:
        print(f"[soak] done: {trial} trials OK ({time.time()-t0:.0f}s)", flush=True)
        break
    trial += 1
    rng = np.random.default_rng(SEED_BASE + trial)
    n = int(rng.integers(3, 200))
    alpha_lo, alpha_hi = (97, 105) if rng.random() < 0.5 else (97, 123)
    needles = list(dict.fromkeys(
        bytes(rng.integers(alpha_lo, alpha_hi, size=rng.integers(1, 9), dtype=np.uint8).tobytes())
        for _ in range(n + 10)))[:n]
    if rng.random() < 0.2:
        needles.append(needles[0])  # duplicate
    if rng.random() < 0.15:
        needles.append(b"\x00" + needles[0][:2])  # NUL needle
    if rng.random() < 0.15:
        needles.append(b"")  # empty needle: root piggyback quirk
    m = ac.build([(x, i) for i, x in enumerate(needles)])
    frags = [x for x in needles[:15]] + [bytes(rng.integers(alpha_lo, alpha_hi+2, size=9, dtype=np.uint8).tobytes())]
    hay = b"".join(frags[i] for i in rng.integers(0, len(frags), int(rng.integers(50, 900))))
    expected = ac.count_matches(m, hay)
    got_cpp = CppAcEngine(m).count(np.frombuffer(hay, dtype=np.uint8))
    assert got_cpp == expected, (trial, "cpp", got_cpp, expected)
    # Independent NFA oracle: full (end, id) emission-order parity on a
    # slice (scalar Python — keep it small), incl. empty-needle trials.
    from alfred_margaret_tpu.models.nfa_oracle import cross_check_matches
    sl = hay[:2048]
    osl = ac.all_matches(m, sl)
    cross_check_matches(needles, sl, [x.pos for x in osl], [x.value for x in osl])
    # comb16 interpret (single pass) when it fits
    try:
        e16 = Comb16PallasAcEngine(m, n_streams=256, t_tile=64, interpret=True)
        got = e16.count(hay)
        assert got == expected, (trial, "comb16", got, expected)
        c = e16.contains(hay)
        assert c == (expected > 0), (trial, "comb16-contains")
        ends, vids = e16.matches_arrays(hay)
        oracle = ac.all_matches(m, hay)
        assert len(ends) == len(oracle) and all(
            int(e) == o.pos and int(v) == o.value for e, v, o in zip(ends, vids, oracle)
        ), (trial, "comb16-matches")
    except CapacityError:
        pass
    # host bitap: independent C++ register-automaton implementation
    from alfred_margaret_tpu.native.cpp_engine import CppBitapEngine, plan_host_bitap
    if plan_host_bitap(m) is not None:
        got = CppBitapEngine(m).count(np.frombuffer(hay, dtype=np.uint8))
        assert got == expected, (trial, "host-bitap", got, expected)
    # bitap register automaton (small needle sets; different ALGORITHM,
    # so this is cross-algorithm conformance, not just kernel parity)
    from alfred_margaret_tpu.ops.bitap_scan import BitapAcEngine, plan_bitap
    if plan_bitap(m) is not None:
        be = BitapAcEngine(m, n_streams=256, t_tile=32, interpret=True)
        stb = be.stage(np.frombuffer(hay, dtype=np.uint8))
        got = be.count_staged(stb)
        assert got == expected, (trial, "bitap", got, expected)
        assert be.count_staged(stb, reps=2) == 2 * expected, (trial, "bitap-reps")
        assert be.contains_staged(stb) == (expected > 0), (trial, "bitap-contains")
    # grouped fused
    try:
        ge = GroupedPallasAcEngine(m, max_rows=5, n_streams=256, t_tile=64, interpret=True, unroll=4)
        got = ge.count(hay)
        assert got == expected, (trial, "grouped", got, expected, ge._fused is not None)
        gc = ge.contains(hay)
        assert gc == (expected > 0), (trial, "grouped-contains", ge._fused_sticky_setup() is not None)
    except CapacityError:
        pass
    # distributed xla inner on the virtual mesh (empty-needle machines are
    # not needle-shardable — root-piggyback counts are a union over shards —
    # so they run on the data-only mesh instead)
    mesh_t = MESH_DATA if b"" in needles else MESH
    de = DistributedAcEngine(m, mesh_t, inner="xla")
    got = de.count(hay)
    assert got == expected, (trial, "dist", got, expected)
    # streaming chunk-boundary round: small chunks force several boundaries,
    # exercising the cold-prefix replay subtraction (count) and the
    # ends > a dedup filter (matches) on every trial shape.
    if trial % 2 == 0:
        from alfred_margaret_tpu.ops.pallas_scan import PallasAcEngine
        from alfred_margaret_tpu.ops.streaming import StreamingScanner
        try:
            se = PallasAcEngine(m, n_streams=128, t_tile=16, interpret=True)
        except CapacityError:
            se = None
        if se is not None:
            # ~4 boundaries per trial: interpret-mode chunk scans are slow,
            # so keep the chunk count small but the boundary *placement*
            # random (the | 1 below de-aligns it from needle lengths).
            chunk = max(4 * max(1, m.max_needle_bytes),
                        (len(hay) // int(rng.integers(2, 6))) | 1)
            sc = StreamingScanner(se, m, chunk_bytes=chunk)
            got_s = sc.count(hay)
            assert got_s == expected, (trial, "stream-count", chunk, got_s, expected)
            ends_s, vids_s = sc.matches_arrays(hay)
            oracle = ac.all_matches(m, hay)
            assert len(ends_s) == len(oracle) and all(
                int(e) == o.pos and int(v) == o.value
                for e, v, o in zip(ends_s, vids_s, oracle)
            ), (trial, "stream-matches", chunk, len(ends_s), len(oracle))
            assert sc.contains(hay) == (expected > 0), (trial, "stream-contains")
    # IGNORE_CASE searcher round: composed case DFA (when eligible) through
    # the engine ladder with count minimization, vs the scalar oracle.
    if trial % 3 == 0:
        from alfred_margaret_tpu import Searcher, IGNORE_CASE
        from alfred_margaret_tpu.engine import MatchEngine
        # dedupe by lowercase: the searcher merges duplicate-needle payloads
        # (two counts per position) while the mlow oracle below dedups, so
        # feed both sides the same deduped set.
        ci_needles = list(dict.fromkeys(
            n.decode("latin1").lower() for n in needles[:12] if n and b"\x00" not in n))
        if ci_needles:
            saved = MatchEngine.AUTO_COMPOSE_BYTES
            MatchEngine.AUTO_COMPOSE_BYTES = 0  # force composition
            try:
                sci = Searcher.build_needle_id_searcher(IGNORE_CASE, ci_needles)
                hay_ci = hay.decode("latin1").upper().encode("latin1")
                got_ci = sci.count_matches(hay_ci)
                # oracle: lower the haystack, count with a CS machine on
                # lowered needles (simple per-cp lowering == latin1 .lower()
                # for the ascii alphabet used here)
                mlow = ac.build([(n.lower().encode("latin1"), i) for i, n in
                                 enumerate(dict.fromkeys(x.lower() for x in ci_needles))])
                exp_ci = ac.count_matches(mlow, hay_ci.decode("latin1").lower().encode("latin1"))
                assert got_ci == exp_ci, (trial, "ignore-case", got_ci, exp_ci)
                # CI bitap lane: byte-class register automaton on the RAW
                # mixed-case bytes (cross-algorithm vs the composed DFA;
                # latin1-upper haystacks include invalid-UTF-8 passthrough
                # bytes, stressing the closure/trap exactness argument).
                cmeng = sci._engine._composed(IGNORE_CASE)
                if cmeng is not None:
                    from alfred_margaret_tpu.ops.bitap_scan import (
                        BitapAcEngine as _BAE,
                        plan_bitap_ci,
                    )
                    layci = plan_bitap_ci(cmeng.machine)
                    if layci is not None:
                        bce = _BAE(cmeng.machine, layout=layci,
                                   n_streams=256, t_tile=32, interpret=True)
                        stci = bce.stage(np.frombuffer(hay_ci, dtype=np.uint8))
                        got_b = bce.count_staged(stci)
                        assert got_b == exp_ci, (
                            trial, "ci-bitap", got_b, exp_ci,
                            layci.trap is not None)
                        assert bce.contains_staged(stci) == (exp_ci > 0), (
                            trial, "ci-bitap-contains")
                    # host byte-class bitap: third independent algorithm
                    from alfred_margaret_tpu.native.cpp_engine import (
                        CppBitapEngine as _CBE,
                        plan_host_bitap_ci,
                    )
                    if plan_host_bitap_ci(cmeng.machine) is not None:
                        got_h = _CBE(cmeng.machine).count(
                            np.frombuffer(hay_ci, dtype=np.uint8))
                        assert got_h == exp_ci, (
                            trial, "host-ci-bitap", got_h, exp_ci)
            finally:
                MatchEngine.AUTO_COMPOSE_BYTES = saved
    # Replacer round: incremental loop (incl. the batched no-interaction
    # fast path when it engages) vs the full-rescan loop, bit-exact.
    if trial % 4 == 1:
        from alfred_margaret_tpu import CASE_SENSITIVE, Replacer
        from alfred_margaret_tpu import replacer as replacer_mod

        # incl. empty needles: the root-piggyback quirk flows through the
        # replacer's match list (all three loops verified equivalent).
        r_needles = [n.decode("latin1") for n in dict.fromkeys(needles[:6])]
        if r_needles:
            # Half the trials draw replacements byte-disjoint from the
            # needle alphabet (forces _run_batched eligibility); the rest
            # share bytes (forces the window-rescan loop).
            rep_alpha = "XYZ" if rng.random() < 0.5 else "Xa"
            pairs = [
                (x, "".join(rng.choice(list(rep_alpha))
                            for _ in range(int(rng.integers(0, 4)))))
                for x in r_needles
            ]
            hay_r = hay.decode("latin1")[:4000]
            saved_inc = replacer_mod.INCREMENTAL
            try:
                replacer_mod.INCREMENTAL = True
                got_r = Replacer.build(CASE_SENSITIVE, pairs).run(hay_r)
                replacer_mod.INCREMENTAL = False
                exp_r = Replacer.build(CASE_SENSITIVE, pairs).run(hay_r)
            finally:
                replacer_mod.INCREMENTAL = saved_inc
            assert got_r == exp_r, (trial, "replacer", pairs, hay_r[:60])
    if trial % 10 == 0:
        print(f"[soak] {trial} trials OK ({time.time()-t0:.0f}s)", flush=True)
    if trial % 50 == 0:
        jax.clear_caches()  # per-trial machines would grow the jit cache unboundedly
