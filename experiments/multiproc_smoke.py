"""Two-process ``jax.distributed`` smoke (VERDICT r2 item 7).

Exercises the REAL multi-host init path the weak-scaling model assumes
(``parallel/shard.py:init_distributed``): two CPU processes, a localhost
coordinator, one global 8-device mesh (4 virtual CPU devices per process),
a global ``DistributedAcEngine`` count with psum riding the cross-process
collective layer, and count parity vs the host C++ engine.

Run with no arguments to launch both processes and wait:

    python experiments/multiproc_smoke.py

Exit code 0 == both processes agreed on the global count and contains.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(port: int, pid: int) -> None:
    sys.path.insert(0, REPO)
    import jax

    # Programmatic platform pin: some environments export JAX_PLATFORMS
    # from the shell profile, overriding the launcher's env.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from alfred_margaret_tpu.parallel import (
        DistributedAcEngine,
        init_distributed,
        make_mesh,
    )

    n_proc = init_distributed(f"localhost:{port}", 2, pid)
    assert n_proc == 2, f"process_count {n_proc}"
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    from alfred_margaret_tpu.models import ac
    from alfred_margaret_tpu.native.cpp_engine import CppAcEngine

    needles = ["tshirt", "shirts", "shorts", "short"]
    m = ac.build([(n, i) for i, n in enumerate(needles)])
    rng = np.random.default_rng(13)
    frags = [n.encode() for n in needles] + [b"zzzz", b"qq xx", b"sh"]
    hay = b"".join(frags[i] for i in rng.integers(0, len(frags), 40000))
    expected = CppAcEngine(m).count(np.frombuffer(hay, dtype=np.uint8))

    mesh = make_mesh(jax.devices(), data=8)  # GLOBAL mesh: spans processes
    eng = DistributedAcEngine(m, mesh, inner="xla")
    got = eng.count(hay)
    assert got == expected, (pid, got, expected)
    assert eng.contains_any(hay) is True
    assert eng.contains_any(b"zzz qqq") is False
    print(f"[proc {pid}] global count {got} == expected; contains OK", flush=True)


def main() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        # Cross-process CPU collectives; without this the CPU backend
        # builds a local-only client and process_count() stays 1.
        JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i), "--port", str(port)],
            env=env,
        )
        for i in range(2)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    ok = all(rc == 0 for rc in rcs)
    print(f"multiproc smoke: rcs={rcs} {'OK' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if "--proc" in sys.argv:
        i = sys.argv.index("--proc")
        pid = int(sys.argv[i + 1])
        port = int(sys.argv[sys.argv.index("--port") + 1])
        child(port, pid)
    else:
        sys.exit(main())
