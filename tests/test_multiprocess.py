"""Two-process ``jax.distributed`` smoke lane (opt-in: AMT_MULTIPROC_TESTS=1).

Subprocess-launches ``experiments/multiproc_smoke.py``: 2 CPU processes,
localhost coordinator, one global 8-device mesh, gloo cross-process
collectives, DistributedAcEngine psum count parity.  Opt-in because it
forks fresh interpreters (~1 min) and binds a localhost port.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("AMT_MULTIPROC_TESTS") != "1",
    reason="opt-in: set AMT_MULTIPROC_TESTS=1 (forks 2 jax processes)",
)
def test_two_process_distributed_count():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", "multiproc_smoke.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "OK" in out.stdout
