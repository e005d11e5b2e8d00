"""Persistent XLA compilation cache for the pipeline CLIs.

The tunneled dev TPU backend compiles at ~1-7 minutes per program, and the
offline builder alone traces half a dozen programs (registration chunk,
PCA, k-means, word assignment, idf scatter, descriptor scatter) — without a
persistent cache every run pays all of them again (the tf-idf stage of one
LM-O object profiled at 196 s, almost entirely remote compilation). Every
entry point calls `enable_persistent_cache()` so repeat runs and
multi-object sweeps hit the disk cache instead.

No reference counterpart (the reference has no compiled stage at all); the
cache directory mirrors bench.py's `.jax_cache` at the repo root.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
)


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Points jax at a persistent compilation cache (no-op on failure)."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", cache_dir or _DEFAULT_DIR
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
