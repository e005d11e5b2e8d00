"""Jitted Lloyd k-means on the MXU.

TPU-native replacement for the reference's faiss.Kmeans
(reference: utils/cluster_util.py:13-68). Assignment is a tiled
distance-argmin (matmul-dominated), the centroid update is a segment-sum — a
fixed number of `lax.scan` iterations, fully on-device with no host transfers.
Initialization picks a seeded random subset of samples, matching faiss's
default init strategy (cluster IDs are not bitwise-comparable to faiss —
parity is judged at the retrieval/pose level, see SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from foundpose_tpu.ops.knn import pairwise_sqdist

Array = jax.Array


class KMeansResult(NamedTuple):
    centroids: Array  # [K, D]
    assignments: Array  # [N]
    distances: Array  # [N] squared L2 to assigned centroid


def _kmeanspp_init(
    samples: Array, num_clusters: int, key: Array, sample_mask: Array
) -> Array:
    """k-means++ seeding: each next center sampled with prob ∝ min-dist².

    A `lax.scan` of K steps; each step is one N-vector distance update, so the
    whole init is O(K·N·D) matmul work — far more robust than faiss's plain
    random-subset init for well-separated data.
    """
    n = samples.shape[0]
    valid = sample_mask.astype(jnp.float32)
    k0, key = jax.random.split(key)
    first = jax.random.choice(k0, n, p=valid / jnp.sum(valid))

    def step(carry, step_key):
        min_d2, last_id = carry
        c = samples[last_id]
        d2 = jnp.sum((samples - c) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        probs = min_d2 * valid
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-30)
        next_id = jax.random.choice(step_key, n, p=probs)
        return (min_d2, next_id), last_id

    keys = jax.random.split(key, num_clusters)
    init = (jnp.full((n,), jnp.inf, dtype=jnp.float32), first)
    _, ids = jax.lax.scan(step, init, keys)
    return samples[ids]


def _assign(samples: Array, centroids: Array, sample_mask: Array) -> Tuple[Array, Array]:
    d = pairwise_sqdist(samples, centroids, precision=jax.lax.Precision.DEFAULT)
    assign = jnp.argmin(d, axis=-1)
    mind = jnp.take_along_axis(d, assign[:, None], axis=-1)[:, 0]
    return assign, jnp.where(sample_mask, mind, 0.0)


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(
    samples: Array,
    num_clusters: int,
    key: Array,
    num_iters: int = 50,
    sample_mask: Optional[Array] = None,
) -> KMeansResult:
    """Lloyd iterations with random-subset init.

    Args:
        samples: [N, D] float features (rows may be padding, see sample_mask).
        num_clusters: K.
        key: PRNGKey for initialization.
        num_iters: fixed Lloyd iteration count (reference default: 50,
            utils/cluster_util.py:40).
        sample_mask: optional [N] bool marking valid rows.
    """
    n, d = samples.shape
    if sample_mask is None:
        sample_mask = jnp.ones((n,), dtype=bool)
    samples = samples.astype(jnp.float32)

    centroids = _kmeanspp_init(samples, num_clusters, key, sample_mask)

    def step(centroids, _):
        assign, _ = _assign(samples, centroids, sample_mask)
        w = sample_mask.astype(samples.dtype)
        sums = jax.ops.segment_sum(
            samples * w[:, None], assign, num_segments=num_clusters
        )
        counts = jax.ops.segment_sum(w, assign, num_segments=num_clusters)
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid (faiss re-seeds; keeping
        # the centroid is the jit-friendly equivalent and converges similarly).
        new_centroids = jnp.where((counts > 0)[:, None], new_centroids, centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    assign, mind = _assign(samples, centroids, sample_mask)
    return KMeansResult(centroids=centroids, assignments=assign, distances=mind)
