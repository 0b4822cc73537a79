"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes. The axon TPU plugin ignores JAX_PLATFORMS,
so we use jax.config.update('jax_platforms', ...) which it honors.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
