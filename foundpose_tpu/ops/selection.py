"""TPU-native smallest-k selection via radix threshold + one-hot compaction.

`lax.top_k` lowers to a full sort (measured ~240 ms/batch at the buddy-
selection shape) and `lax.approx_min_k` still dominates the matching stage at
k=300 of Q=900 (it is designed for k << Q). This module selects the k
smallest entries WITHOUT any sort:

1. Each value is encoded as a sortable int32 key — the IEEE-754 bit pattern
   of a non-negative float is monotonically ordered as an integer — with the
   low bits replaced by the element index so keys are strictly unique (ties
   break by index, like a stable sort).
2. The k-th smallest key is found by a 31-step radix descent (one masked
   compare+count pass per bit — pure VPU, no data movement).
3. The selected elements are compacted into k dense slots with a one-hot
   [Q, k] matmul built from the selection mask's prefix-sum ranks — MXU
   work instead of gathers.

The index tie-break perturbs each value by at most 2^bits ulps, so selection
can differ from an exact top-k only among elements whose keys collide within
that window — rank-equivalent for correspondence pruning (the reference's
own faiss/torch tie order is arbitrary, SURVEY.md §7 hard-part (c)).
Compacted slots are ordered by element index, not by value; downstream
consumers (RANSAC, scoring) are order-agnostic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Values at or above this stand for "invalid"; keep well below f32 inf so
# compaction matmuls never meet inf (0 * inf = NaN would poison the output).
INVALID_SENTINEL = 1e30


def _unique_keys(values: Array, index_bits: int) -> Array:
    """Strictly-ordered int32 keys for non-negative f32 values."""
    q = values.shape[-1]
    raw = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, values.shape, values.ndim - 1)
    mask = jnp.int32((1 << index_bits) - 1)
    return (raw & ~mask) | (idx & mask)


def _kth_smallest_key(keys: Array, k: int) -> Array:
    """Radix descent for the k-th smallest (1-indexed) int32 key >= 0.

    keys: [..., Q] non-negative int32 (sign bit clear). Returns [...] int32.
    """
    batch_shape = keys.shape[:-1]
    prefix = jnp.zeros(batch_shape, jnp.int32)
    remaining = jnp.full(batch_shape, k, jnp.int32)
    for b in reversed(range(31)):
        cand = prefix << 1  # bits [30..b] with bit b = 0
        cnt0 = jnp.sum((keys >> b) == cand[..., None], axis=-1).astype(jnp.int32)
        take_zero = cnt0 >= remaining
        prefix = jnp.where(take_zero, cand, cand | 1)
        remaining = jnp.where(take_zero, remaining, remaining - cnt0)
    return prefix


def compact_smallest_k(
    values: Array, k: int, index_bits: int | None = None
) -> Tuple[Array, Array]:
    """Selection matrix for the k smallest entries of each row.

    Args:
        values: [..., Q] non-negative f32; entries >= INVALID_SENTINEL are
            selected only when fewer than k valid entries exist.
        k: number of slots (k <= Q required).
        index_bits: low bits of the float encoding replaced by the index;
            defaults to the smallest width covering Q (strict key
            uniqueness).

    Returns:
        (onehot [..., Q, k] f32, selected [..., Q] bool). `onehot` has
        exactly one 1 per selected element, placing it at a slot ordered by
        element index; compact a channel c [..., Q] as
        `einsum('...qk,...q->...k', onehot, c)`.
    """
    q = values.shape[-1]
    if k > q:
        raise ValueError(f"k={k} > Q={q}")
    if index_bits is None:
        index_bits = max(1, (q - 1).bit_length())
    if q > (1 << index_bits):
        raise ValueError(f"Q={q} needs more than index_bits={index_bits}")
    vals = jnp.minimum(values.astype(jnp.float32), INVALID_SENTINEL)
    keys = _unique_keys(vals, index_bits)
    kth = _kth_smallest_key(keys, k)
    sel = keys <= kth[..., None]  # exactly k per row (keys are unique)
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1
    slots = jax.lax.broadcasted_iota(jnp.int32, (*values.shape, k), values.ndim)
    onehot = (sel[..., None] & (rank[..., None] == slots)).astype(jnp.float32)
    return onehot, sel
