"""Bisect pallas kernel cost: loop+read only / +class / +table / full."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, R, TT = 4096, 32, 256
T = 16640
n_tiles = T // TT
rng = np.random.default_rng(0)
streams = rng.integers(0, 256, size=(T, R, 128), dtype=np.int32)
classmap = rng.integers(0, 7, size=(2, 128), dtype=np.int32)
table = rng.integers(0, 1 << 21, size=(1, 128), dtype=np.int32)

def run_variant(name, body_fn):
    def kernel(cm_ref, tab_ref, st_ref, out_ref, scr):
        tile = pl.program_id(0)
        @pl.when(tile == 0)
        def _():
            scr[:] = jnp.zeros((R, 128), jnp.int32)
        cm_rows = [jax.lax.broadcast_in_dim(cm_ref[:][i], (R,128), (1,)) for i in range(2)]
        tab_rows = [jax.lax.broadcast_in_dim(tab_ref[:][0], (R,128), (1,))]
        def body(t, sbase):
            return body_fn(st_ref[t], sbase, cm_rows, tab_rows)
        scr[:] = jax.lax.fori_loop(0, TT, body, scr[:])
        @pl.when(tile == n_tiles - 1)
        def _():
            out_ref[:] = scr[:]
    @jax.jit
    def run(cm, tab, st):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((2,128), lambda i: (0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1,128), lambda i: (0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TT,R,128), lambda i: (i,0,0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R,128), lambda i: (0,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((R,128), jnp.int32)],
        )(cm, tab, st)
    import jax as _j
    cm_d = _j.device_put(classmap); tab_d = _j.device_put(table); st_d = _j.device_put(streams)
    r = run(cm_d, tab_d, st_d)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _res = int(np.asarray(run(cm_d, tab_d, st_d)).sum())
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1e3:.1f} ms  {T*S/best/1e9:.2f} GB/s  ({best/T*1e9:.0f} ns/step)", flush=True)

def v_read(b, s, cm, tab):   # xor only
    return s ^ b
def v_class(b, s, cm, tab):  # + class lookup
    lo = b & 127
    c = jnp.where(b < 128, jnp.take_along_axis(cm[0], lo, axis=1), jnp.take_along_axis(cm[1], lo, axis=1))
    return s ^ c
def v_table(b, s, cm, tab):  # + table gather on state
    idx = (s + b) & 127
    v = jnp.take_along_axis(tab[0], idx, axis=1)
    return v
def v_full(b, s, cm, tab):
    lo = b & 127
    c = jnp.where(b < 128, jnp.take_along_axis(cm[0], lo, axis=1), jnp.take_along_axis(cm[1], lo, axis=1))
    idx = (s + c) & 127
    v = jnp.take_along_axis(tab[0], idx, axis=1)
    return v & 0xFFFFF

for name, fn in [("read-only", v_read), ("class", v_class), ("table", v_table), ("full", v_full)]:
    run_variant(name, fn)
