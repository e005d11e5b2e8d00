"""Device profiling: jax profiler traces + per-stage device timing.

TPU-native replacement for the reference's wall-clock-only Timers
(reference: utils/misc.py:30-45, SURVEY.md §5.1). `trace()` captures an XLA
profile viewable in TensorBoard/Perfetto; `device_time()` measures real device
execution of a jitted callable, accounting for backends that defer execution
until a host fetch (e.g. tunneled TPU clients).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager capturing a jax profiler trace into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_execution(tree) -> float:
    """Forces device execution of a pytree's arrays; returns a checksum.

    On deferred-execution backends `block_until_ready` may be a no-op on the
    client future; fetching a scalar reduction guarantees the computation ran.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    acc = jnp.asarray(0.0, dtype=jnp.float32)
    for leaf in leaves:
        flat = leaf.reshape(-1)[:4].astype(jnp.float32)
        acc = acc + jnp.sum(jnp.where(jnp.isfinite(flat), flat, 0.0))
    return float(acc)


def device_time_scan(
    fn: Callable, *args, iters: int = 8, repeats: int = 3
) -> float:
    """Seconds per call of `fn(*args)`, measured as pure device time.

    Runs `iters` sequentially-dependent applications of `fn` inside ONE jitted
    `lax.scan` program (a scalar carry perturbs EVERY float input and is
    updated from every output leaf, so no part of the body can be CSE'd,
    dead-code-eliminated, or hoisted out of the loop as loop-invariant),
    and differences against a length-1 program: per-call time =
    (t_iters - t_1) / (iters - 1). This cancels fixed dispatch/transfer/fetch
    costs, which dominate wall-clock on tunneled backends where every program
    launch is a host round trip. Perturbation adds on inputs the function
    never uses are themselves dead code, so they cost nothing.
    """
    leaves, _ = jax.tree.flatten(args)
    if not any(
        hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
        for l in leaves
    ):
        raise ValueError("device_time_scan needs at least one float array arg")

    def make(length: int):
        @jax.jit
        def many(*a):
            lv, td = jax.tree.flatten(a)

            def body(carry, _):
                eps = carry * 1e-30
                lv2 = [
                    l + eps.astype(l.dtype)
                    if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
                    else l
                    for l in lv
                ]
                out = fn(*jax.tree.unflatten(td, lv2))
                # The carry must consume EVERY output leaf in full, or XLA
                # dead-code-eliminates (or slices down) the unconsumed
                # computations inside the scan body.
                c = carry
                for leaf in jax.tree.leaves(out):
                    c = c + jnp.sum(leaf.astype(jnp.float32)) * jnp.float32(1e-30)
                # A NaN checksum would poison the next iteration's input.
                c = jnp.where(jnp.isfinite(c), c, jnp.float32(0.0))
                return c, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return c

        return many

    f1, fk = make(1), make(iters)
    # Compile + warm both programs outside the timed region.
    force_execution(f1(*args))
    force_execution(fk(*args))

    def measure(f):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            force_execution(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = measure(f1), measure(fk)
    return max(tk - t1, 0.0) / (iters - 1)


def device_time(
    fn: Callable, *args, iters: int = 5, warmup: int = 1, chain: bool = True
) -> float:
    """Seconds per call of a jitted `fn(*args)`, measured honestly.

    Steps are chained through a data dependency (a zero-scaled scalar mixed
    into the first array argument) so all `iters` executions provably run
    before the single terminal fetch.
    """
    for _ in range(warmup):
        out = fn(*args)
    force_execution(out)

    start = time.perf_counter()
    carry = jnp.asarray(0.0, dtype=jnp.float32)
    for _ in range(iters):
        if chain and args and hasattr(args[0], "dtype"):
            first = args[0] + (carry * 0).astype(args[0].dtype)
            out = fn(first, *args[1:])
        else:
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        carry = jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))
    force_execution(carry)
    return (time.perf_counter() - start) / iters
