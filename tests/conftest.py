"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding paths
(`alfred_margaret_tpu.parallel`) can be exercised without TPU hardware, per
the reference test strategy analogue in SURVEY.md §4 (multi-chip results must
be identical to single-chip). Environment variables must be set before JAX is
imported anywhere.

Opt-in hardware lane: ``AMT_TPU_TESTS=1`` leaves the real TPU backend alive
so ``tests/test_tpu_hardware.py`` can run the Pallas kernels non-interpreted
on a chip (everything else still passes — engines are backend-portable, just
slower to compile).
"""

import os

TPU_LANE = os.environ.get("AMT_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The axon TPU plugin on this machine ignores the JAX_PLATFORMS env var,
    # so force the platform through the config API as well.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
