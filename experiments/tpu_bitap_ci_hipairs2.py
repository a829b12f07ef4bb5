"""Dedicated on-chip probe for the bitap `_hi_pairs` compare-select mode.

An embedded-trap CI layout whose match tracks are pure ASCII carries a few
non-ASCII trap bytes (İ = C4 B0, Kelvin K = E2 84 AA) in the same word's
btab: `btab[127] == 0` with a sparse high half, so `_b_of` resolves the
high half as a short compare-select chain — ONE gather total instead of
2 rows + select.  Round 4 exercised this only indirectly (the embed
experiment timed out at rc=124 before its dedicated probe could land);
this probe (a) asserts the mode actually engages for the layout, (b)
checks counts exactly against the scalar IgnoreCase oracle on clean and
trap-firing corpora, and (c) measures the paired rate vs the forced 2-row
path in the same session (rep-slope; results materialized every run
because block_until_ready does not block on the axon relay).

Sized small (16 MiB, 3 rounds) so it completes well inside a relay
session — the round-4 predecessor died on a 64 MiB corpus + flapping
relay.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MB = int(os.environ.get("PROBE_MB", "16"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "3"))
R_HI = int(os.environ.get("PROBE_RHI", "65"))


def log(msg):
    print(msg, flush=True)


def slope(eng, st, n_eff):
    times = {}
    for reps in (1, R_HI):
        eng.count_staged(st, reps)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            eng.count_staged(st, reps)
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    dt = times[R_HI] - times[1]
    return ((R_HI - 1) * n_eff / dt if dt > 0 else float("nan")), times


def main():
    import jax

    from alfred_margaret_tpu.models import ac, case_dfa
    from alfred_margaret_tpu.ops import bitap_scan as bs
    from alfred_margaret_tpu.utils import utf8
    from alfred_margaret_tpu.utils.case import IGNORE_CASE

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    needles = ["kilo", "dress"]  # 'k'/'i' pull the K/İ traps
    low = [utf8.lower_str(n) for n in needles]
    m = ac.build([(n, i) for i, n in enumerate(low)])
    cm = case_dfa.compose_build(list(zip(m.needles, m.values)), machine=m)
    lay = bs.plan_bitap_ci(cm)
    assert lay is not None and lay.has_trap
    hp = [None if wl.fold else bs._hi_pairs(wl.btab) for wl in lay.all_words()]
    n_hp = sum(1 for h in hp if h)
    log(f"layout: V={lay.n_words} trap_word={lay.trap is not None} "
        f"embedded_trap_bits={[bin(w.trap_endmask).count('1') for w in lay.words]} "
        f"hi_pairs_words={n_hp} (pairs per word: {[len(h) if h else 0 for h in hp]})")
    assert n_hp >= 1, "hi-pairs mode did not engage: probe premise broken"

    unit = b"KILO dress kIlO DRESS filler pad "
    corpus = unit * ((N_MB << 20) // len(unit))
    data = np.frombuffer(corpus, dtype=np.uint8)
    want_small = ac.count_matches(m, corpus[: 1 << 20], IGNORE_CASE)

    eng = bs.BitapAcEngine(cm, layout=lay)
    st = eng.stage(data)
    got_small = eng.count_staged(eng.stage(np.frombuffer(corpus[: 1 << 20], dtype=np.uint8)))
    assert got_small == want_small, (got_small, want_small)
    got = eng.count_staged(st)
    rate_hp, t_hp = slope(eng, st, len(data))
    log(f"hi-pairs  count={got} slope {rate_hp/1e9:6.1f} GB/s  "
        f"t1 {t_hp[1]*1e3:6.2f} ms t{R_HI} {t_hp[R_HI]*1e3:8.2f} ms")

    # Forced 2-row path: same layout, hi-pairs disabled.
    saved = bs.HI_PAIR_MAX
    bs.HI_PAIR_MAX = 0
    try:
        eng2 = bs.BitapAcEngine(cm, layout=lay)
        st2 = eng2.stage(data)
        got2 = eng2.count_staged(st2)
        assert got2 == got, (got2, got)
        rate_2r, t_2r = slope(eng2, st2, len(data))
    finally:
        bs.HI_PAIR_MAX = saved
    log(f"two-row   count={got2} slope {rate_2r/1e9:6.1f} GB/s  "
        f"t1 {t_2r[1]*1e3:6.2f} ms t{R_HI} {t_2r[R_HI]*1e3:8.2f} ms  "
        f"hi-pairs/two-row = {rate_hp/rate_2r:4.2f}x")

    # Trap-firing corpus: Kelvin sign, counts stay exact (localized
    # recovery), still on the hi-pairs engine.
    trap = bytearray(corpus[: 4 << 20])
    patch = "KILO".encode()
    trap[len(trap) // 2 : len(trap) // 2 + len(patch)] = patch
    trap = bytes(trap)
    want_t = ac.count_matches(m, trap, IGNORE_CASE)
    st3 = eng.stage(np.frombuffer(trap, dtype=np.uint8))
    got_t = eng.count_staged(st3)
    assert got_t == want_t, (got_t, want_t)
    log(f"trap-firing corpus exact: {got_t} (localized recovery, "
        f"dense fallback compiled: {(st3.plan.time_len, 1) in eng._count_fn})")


if __name__ == "__main__":
    main()
