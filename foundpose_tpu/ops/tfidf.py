"""Bag-of-visual-words tf-idf descriptors and template retrieval.

TPU-native re-design of the reference BoW layer
(reference: utils/template_util.py:13-202). Word assignment is a matmul
top-k against the codebook, descriptors are built with `segment_sum`
scatter-adds, and retrieval is a single cosine-similarity matmul against the
whole template descriptor bank followed by `top_k` — all batched over query
crops and jit-compiled, with masked (padded) features supported so ragged
query sets stay static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from foundpose_tpu.ops.knn import knn_search

Array = jax.Array


class TfidfConfig(NamedTuple):
    """Template-descriptor options. (reference: utils/repre_util.py:24-31)"""

    knn_k: int = 3
    metric: str = "l2"
    soft_assign: bool = False
    soft_sigma_squared: float = 10.0


def calc_tfidf(
    word_ids: Array,
    word_dists: Array,
    word_idfs: Array,
    soft_assign: bool = False,
    soft_sigma_squared: float = 10.0,
    feature_mask: Optional[Array] = None,
) -> Array:
    """tf-idf descriptor from per-feature word assignments.

    Args:
        word_ids: [N, k] visual-word ids per feature.
        word_dists: [N, k] L2 distances (not squared) to those words.
        word_idfs: [W] inverse document frequencies.
        feature_mask: optional [N] bool; padded features contribute nothing
            and do not count toward the tf normalizer.

    Returns:
        [W] tf-idf descriptor. (reference: utils/template_util.py:31-71,
        following Torii et al., with weights L2-normalized per feature and
        tf divided by the feature count.)
    """
    n, k = word_ids.shape
    if soft_assign:
        weights = jnp.exp(-jnp.square(word_dists) / (2.0 * soft_sigma_squared))
    else:
        weights = jnp.ones_like(word_dists)
    # L2-normalize the k weights of each feature.
    weights = weights / jnp.maximum(
        jnp.linalg.norm(weights, axis=1, keepdims=True), 1e-12
    )
    if feature_mask is not None:
        weights = weights * feature_mask[:, None]
        num_feats = jnp.maximum(jnp.sum(feature_mask), 1.0)
    else:
        num_feats = jnp.asarray(float(n))

    tf = (weights / num_feats).reshape(-1)
    ids_flat = word_ids.reshape(-1)
    num_words = word_idfs.shape[0]
    # Non-finite idfs (imported reference repres can carry log(T/0)=inf for
    # unused words) would poison the whole descriptor via 0*inf / inf*tf;
    # clamp them to 0 in BOTH branches below so the result never depends on
    # which size-based path an input happens to hit. calc_word_idfs never
    # emits them, and a query feature assigned to such a word would make the
    # reference's score NaN anyway.
    safe_idfs = jnp.where(jnp.isfinite(word_idfs), word_idfs, 0.0)
    if n * k * num_words <= 32 * 2**20:
        # Online-query sizes (LM-O: 900x3 features, 2048 words): a one-hot
        # contraction runs on the MXU and measured 2.2x faster than the
        # scatter-add, which serializes on TPU (benchmarks/micro_retrieval.py:
        # 1.19 -> 0.54 ms/batch-64). The idf lookup rides the same one-hot
        # (gather-free); numerically identical to the scatter path up to
        # f32 summation order.
        onehot = (
            ids_flat[:, None] == jnp.arange(num_words, dtype=ids_flat.dtype)[None, :]
        ).astype(jnp.float32)  # [N*k, W]
        w_idf = onehot @ safe_idfs  # [N*k] gather-free idf lookup
        return (tf * w_idf) @ onehot  # [W]
    # Offline bank sizes (hundreds of k features): the [N*k, W] one-hot would
    # not fit; scatter-add instead (same clamped idfs as the one-hot path).
    tfidf = jnp.where(tf > 0, tf * safe_idfs[ids_flat], 0.0)
    return jax.ops.segment_sum(tfidf, ids_flat, num_segments=num_words)


def calc_word_idfs(
    feat_to_word_ids: Array,
    feat_to_template_ids: Array,
    num_words: int,
    num_templates: int,
    feature_mask: Optional[Array] = None,
) -> Array:
    """idf_w = log(T / #templates containing word w).

    Built as a dense [T, W] presence matrix via scatter-max — one pass instead
    of the reference's per-template unique() loop
    (reference: utils/template_util.py:95-105).
    """
    n = feat_to_word_ids.shape[0]
    ones = jnp.ones((n,), dtype=jnp.float32)
    if feature_mask is not None:
        ones = ones * feature_mask
    presence = jnp.zeros((num_templates, num_words), dtype=jnp.float32)
    presence = presence.at[feat_to_template_ids, feat_to_word_ids].max(ones)
    occurrences = jnp.sum(presence, axis=0)
    # Unused words get the maximum (finite) idf instead of the reference's
    # log(T/0)=inf — queries can still be soft-assigned to them via their
    # k>1 neighbors and an infinite idf would poison the whole descriptor.
    return jnp.log(float(num_templates) / jnp.maximum(occurrences, 1.0))


def assign_words(
    features: Array,
    word_centroids: Array,
    knn_k: int,
    metric: str = "l2",
    approx: bool = False,
) -> Tuple[Array, Array]:
    """k nearest visual words per feature; returns (ids [N,k], dists [N,k]).

    Distances are L2 (sqrt of the squared-L2 the matmul kernel produces),
    matching the faiss convention the reference relies on
    (reference: utils/template_util.py:13-29).
    """
    d2, ids = knn_search(
        features, word_centroids, k=knn_k, metric=metric, approx=approx
    )
    dists = jnp.sqrt(jnp.maximum(d2, 0.0)) if metric == "l2" else d2
    return ids, dists


def calc_template_tfidf_descriptors(
    feat_vectors: Array,
    feat_to_template_ids: Array,
    word_centroids: Array,
    num_templates: int,
    config: TfidfConfig,
    feature_mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Per-template tf-idf descriptor bank [T, W] plus word idfs [W].

    (reference: utils/template_util.py:74-123)
    """
    num_words = word_centroids.shape[0]
    # Chunked assignment keeps the [N, W] distance block bounded for large
    # banks (~300k features x 2048 words at full LM-O scale).
    n = feat_vectors.shape[0]
    chunk = 65536
    if n > chunk:
        ids_l, dists_l = [], []
        for s in range(0, n, chunk):
            i, d = assign_words(
                feat_vectors[s : s + chunk], word_centroids, config.knn_k,
                config.metric,
            )
            ids_l.append(i)
            dists_l.append(d)
        word_ids = jnp.concatenate(ids_l)
        word_dists = jnp.concatenate(dists_l)
    else:
        word_ids, word_dists = assign_words(
            feat_vectors, word_centroids, config.knn_k, config.metric
        )
    idfs = calc_word_idfs(
        word_ids[:, 0], feat_to_template_ids, num_words, num_templates, feature_mask
    )

    # All templates in ONE scatter pass: each (feature, neighbor) contributes
    # tf*idf to its (template, word) cell via a flattened segment-sum —
    # algebraically identical to the reference's per-template loop
    # (template_util.py:107-121) but O(N·k) instead of O(T·N·k).
    n, k = word_ids.shape
    if config.soft_assign:
        weights = jnp.exp(-jnp.square(word_dists) / (2.0 * config.soft_sigma_squared))
    else:
        weights = jnp.ones_like(word_dists)
    weights = weights / jnp.maximum(
        jnp.linalg.norm(weights, axis=1, keepdims=True), 1e-12
    )
    fmask = (
        feature_mask.astype(weights.dtype)
        if feature_mask is not None
        else jnp.ones((n,), dtype=weights.dtype)
    )
    weights = weights * fmask[:, None]
    counts = jax.ops.segment_sum(fmask, feat_to_template_ids, num_segments=num_templates)
    tf = weights / jnp.maximum(counts[feat_to_template_ids], 1.0)[:, None]
    contrib = jnp.where(tf > 0, tf * idfs[word_ids], 0.0)
    keys = feat_to_template_ids[:, None] * num_words + word_ids
    descs = jax.ops.segment_sum(
        contrib.reshape(-1), keys.reshape(-1), num_segments=num_templates * num_words
    ).reshape(num_templates, num_words)
    return descs, idfs


def tfidf_retrieve(
    query_features: Array,
    word_centroids: Array,
    word_idfs: Array,
    template_descs: Array,
    top_n: int,
    config: TfidfConfig,
    query_mask: Optional[Array] = None,
    template_mask: Optional[Array] = None,
    approx_topk: bool = False,
) -> Tuple[Array, Array]:
    """Retrieves the top-N templates for one query crop.

    Returns (template_ids [top_n], scores [top_n]) sorted by descending
    cosine similarity. (reference: utils/template_util.py:126-176)
    """
    word_ids, word_dists = assign_words(
        query_features, word_centroids, config.knn_k, config.metric,
        approx=approx_topk,
    )
    q = calc_tfidf(
        word_ids,
        word_dists,
        word_idfs,
        soft_assign=config.soft_assign,
        soft_sigma_squared=config.soft_sigma_squared,
        feature_mask=query_mask,
    )
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    tn = template_descs / jnp.maximum(
        jnp.linalg.norm(template_descs, axis=-1, keepdims=True), 1e-12
    )
    sims = tn @ qn
    if template_mask is not None:
        sims = jnp.where(template_mask, sims, -jnp.inf)
    scores, ids = jax.lax.top_k(sims, top_n)
    return ids, scores
