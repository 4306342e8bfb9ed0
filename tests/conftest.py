"""Test harness: run everything on CPU with 8 virtual devices.

Multi-host/multi-chip sharding is validated without a cluster via XLA's
host-platform device emulation (SURVEY.md §4). Set TERA_TEST_TPU=1 to run
the suite on real accelerators instead.

NOTE: this image exports JAX_PLATFORMS=axon (the TPU tunnel) and the env
var wins over a child-process override, so we must force the platform via
jax.config *before* any backend is initialized. The TPU is single-client:
letting tests grab it would also block concurrent benchmark runs.
"""

import os

if not os.environ.get("TERA_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
