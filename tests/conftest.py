"""Test configuration: force an 8-device virtual CPU platform before JAX import.

Mirrors SURVEY.md §4's recommendation: sharding/collective code paths are exercised on
a virtual 8-device CPU mesh so no multi-chip hardware is needed, and numerics tests are
deterministic on CPU.
"""

import os

# Force CPU even if the outer environment pins JAX_PLATFORMS to a TPU platform:
# numerics tests need fp32-exact matmuls, and sharding tests need 8 virtual devices.
# The env var alone is not enough (a site hook re-pins the platform), so also set the
# config flag after import.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
