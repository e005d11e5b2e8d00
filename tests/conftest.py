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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Releases compiled XLA executables after each test module.

    The suite compiles hundreds of programs in one process; XLA:CPU's
    compiler was observed to SEGFAULT under that accumulated load (round
    5: reproducibly in full unsplit `pytest tests/` runs, never in
    per-module or split runs — the crash sits inside LLVM during
    backend_compile of a later heavy program). Dropping the jit caches
    between modules lets the executables (and their JIT'd code) be freed;
    modules share almost no compilations, so the cost is noise.
    """
    yield
    jax.clear_caches()
