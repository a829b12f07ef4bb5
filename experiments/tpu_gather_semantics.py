"""Probe Mosaic gather semantics on the real chip (correctness, not speed).

  wrap    take_along_axis(row[R,128], idx, axis=1) with idx in [128, 2*128)
          and with garbage high bits (bit 20+): does hardware index mod 128?
          If yes, the per-byte ``sbase = v & state_mask`` in the count kernel
          is redundant (count bits live at bit >= 20, multiples of 128).
  axis0   take_along_axis(arr[S,128], idx, axis=0): does a cross-sublane
          gather compile at S=8/32/256, and is it correct?
  flat2d  combined (hi, lo) gather of a [S,128] table via axis0 then axis1
          (or vice versa) — the would-be replacement for the select chain.

Each probe is a tiny single-tile kernel; results compared to numpy.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
rng = np.random.default_rng(0)


def run_kernel(fn, out_shape, *inputs):
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs]
    f = pl.pallas_call(
        fn,
        grid=(1,),
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
    )
    return np.asarray(jax.jit(f)(*[jnp.asarray(x) for x in inputs]))


def probe_wrap():
    row = rng.integers(0, 1 << 20, size=(1, 128), dtype=np.int32)
    base = rng.integers(0, 128, size=(R, 128), dtype=np.int32)
    for label, idx in [
        ("idx+128", base + 128),
        ("idx+(7<<20)", base + (7 << 20)),
        ("idx+(count<<20)mix", base + (rng.integers(0, 8, size=(R, 128)) << 20).astype(np.int32)),
    ]:
        def kern(tab_ref, idx_ref, out_ref):
            tab = jax.lax.broadcast_in_dim(tab_ref[:][0], (R, 128), (1,))
            out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

        try:
            got = run_kernel(kern, (R, 128), row, idx)
        except Exception as e:
            print(f"wrap {label}: COMPILE/RUN FAIL: {str(e)[:120]}")
            continue
        want_mod = row[0][idx % 128]
        want_clamp = row[0][np.minimum(idx, 127)]
        verdict = (
            "MOD128" if (got == want_mod).all()
            else "CLAMP" if (got == want_clamp).all()
            else "OTHER"
        )
        print(f"wrap {label}: {verdict}")


def probe_axis0(S):
    tab = rng.integers(0, 1 << 20, size=(S, 128), dtype=np.int32)
    idx = rng.integers(0, S, size=(R, 128), dtype=np.int32)

    def kern(tab_ref, idx_ref, out_ref):
        # gather along sublanes: out[r, l] = tab[idx[r, l], l]
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:][:R] % S, axis=0)[:R]

    try:
        got = run_kernel(kern, (R, 128), tab, idx)
    except Exception as e:
        print(f"axis0 S={S}: FAIL: {str(e)[:160]}")
        return False
    want = np.take_along_axis(tab, idx, axis=0)
    print(f"axis0 S={S}: {'OK' if (got == want).all() else 'WRONG VALUES'}")
    return (got == want).all()


def probe_flat2d(S):
    """Arbitrary flat-index gather from [S,128] via axis1-then-axis0."""
    tab = rng.integers(0, 1 << 20, size=(S, 128), dtype=np.int32)
    flat = rng.integers(0, S * 128, size=(R, 128), dtype=np.int32)

    def kern(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        lo = idx & 127
        hi = idx >> 7
        t = tab_ref[:]
        # step 1: for each table sublane s: y[s, l] = tab[s, lo[?, l]]
        # needs lo per OUTPUT row; with R <= 8 output rows do R axis-1
        # gathers each with one broadcast lo row, then one axis-0 gather.
        outs = []
        for r in range(R):
            lo_r = jax.lax.broadcast_in_dim(lo[r], (S, 128), (1,))
            y = jnp.take_along_axis(t, lo_r, axis=1)  # y[s,l] = tab[s, lo[r,l]]
            hi_r = jax.lax.broadcast_in_dim(hi[r], (1, 128), (1,))
            z = jnp.take_along_axis(y, hi_r, axis=0)  # z[0,l] = tab[hi[r,l], lo[r,l]]
            outs.append(z)
        out_ref[:] = jnp.concatenate(outs, axis=0)

    try:
        got = run_kernel(kern, (R, 128), tab, flat)
    except Exception as e:
        print(f"flat2d S={S}: FAIL: {str(e)[:160]}")
        return
    want = tab.reshape(-1)[np.minimum(flat, S * 128 - 1)].reshape(R, 128)
    want2 = tab[flat >> 7, np.arange(128)[None, :] * 0 + (flat & 127)]
    print(f"flat2d S={S}: {'OK' if (got == want2).all() else 'WRONG'}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("all", "wrap"):
        probe_wrap()
    if which in ("all", "axis0"):
        for S in (8, 32, 256):
            probe_axis0(S)
    if which in ("all", "flat2d"):
        probe_flat2d(32)
