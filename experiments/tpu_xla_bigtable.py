"""Honest XLA-scan engine rate on TPU, small and large automata.

The lax.scan engine gathers from an HBM-resident [n_states*256] table
(jnp.take).  Per call: corpus staged device-side; repeats inside one jit
via lax.fori_loop so the ~30ms relay overhead amortizes.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

S = 8192
T = 8192  # 64 MiB
REPS = 4

rng = np.random.default_rng(0)


def build_fn(n_states):
    @jax.jit
    def run(delta_flat, mc, streams):
        def one_pass(_, acc):
            def step(carry, byte_row):
                states, counts = carry
                states = jnp.take(delta_flat, states * 256 + byte_row.astype(jnp.int32))
                counts = counts + jnp.take(mc, states)
                return (states, counts), None

            (s, c), _ = jax.lax.scan(
                step, (jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.int32)), streams
            )
            return acc + c.sum()

        return jax.lax.fori_loop(0, REPS, one_pass, jnp.int32(0))

    return run


def main(sizes):
    streams = rng.integers(0, 256, size=(T, S), dtype=np.uint8)
    st_d = jax.device_put(streams)
    jax.block_until_ready(st_d)
    total = T * S * REPS
    for n_states in sizes:
        delta = rng.integers(0, n_states, size=(n_states, 256), dtype=np.int32)
        mc = (rng.random(n_states) < 0.01).astype(np.int32)
        d_d = jax.device_put(delta.reshape(-1))
        m_d = jax.device_put(mc)
        jax.block_until_ready(m_d)
        fn = build_fn(n_states)
        try:
            t0 = time.perf_counter()
            out = int(np.asarray(fn(d_d, m_d, st_d)))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                o = int(np.asarray(fn(d_d, m_d, st_d)))
                assert o == out
                best = min(best, time.perf_counter() - t1)
            print(
                f"n_states={n_states:6d} (table {n_states*256*4>>20:4d} MiB): "
                f"{best*1e3:8.1f}ms  {total/best/1e9:7.2f} GB/s  [compile {compile_s:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"n_states={n_states} FAILED: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 4096, 65536])
