import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Must be set before jax is imported anywhere.
# Note: the environment may pin JAX_PLATFORMS to a hardware plugin (e.g. axon),
# so we force-override both the env var and the jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
