"""Validates the driver entry points: entry() traces/lowers, dryrun runs."""

import jax
import numpy as np


def test_entry_lowers():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)  # tracing + lowering catches shape bugs
    assert lowered is not None


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(5)
