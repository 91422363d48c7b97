"""Test configuration: run on a virtual 8-device CPU mesh by default.

The container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so we
must force-overwrite the env AND update jax.config before any array work.
Set PCS_TEST_TPU=1 to run the suite against the real TPU instead (slow
op-by-op dispatch; meant for spot checks, not the full suite).
"""
import os

TEST_TPU = bool(os.environ.get("PCS_TEST_TPU"))

if not TEST_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
