import time

import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu.utils import profiling
from foundpose_tpu.utils.logging_util import Timer, get_logger


def test_force_execution_returns_checksum():
    tree = {"a": jnp.ones((4, 4)), "b": [jnp.arange(3.0), "not-an-array"]}
    s = profiling.force_execution(tree)
    assert np.isfinite(s)
    assert profiling.force_execution({}) == 0.0


def test_device_time_measures_work():
    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((256, 256))
    dt = profiling.device_time(f, x, iters=3)
    assert dt > 0


def test_timer_sync(caplog):
    t = Timer(logger=get_logger("test_timer"))
    t.start()
    time.sleep(0.01)
    dt = t.elapsed("stage", sync_on=jnp.ones(3))
    assert dt is not None and dt >= 0.01
    t_disabled = Timer(enabled=False)
    t_disabled.start()
    assert t_disabled.elapsed() is None
