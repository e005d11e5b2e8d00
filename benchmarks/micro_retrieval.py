"""Microbench: retrieval-stage substages on one TPU chip at LM-O scale.

Quantifies where the retrieval stage's device time goes (word assignment /
tf-idf aggregation / cosine top-N) and compares the segment_sum tf-idf
aggregation against a one-hot matmul formulation (scatter-adds serialize on
TPU; a [Nk, W] one-hot contraction runs on the MXU).

Usage: python benchmarks/micro_retrieval.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.ops.knn import knn_search
    from foundpose_tpu.ops import tfidf as tfidf_mod
    from foundpose_tpu.utils.profiling import device_time_scan

    b, q, dim, w, t, k, top_n = 64, 900, 256, 2048, 798, 3, 5
    cdt = jnp.bfloat16

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    feats = jax.random.normal(keys[0], (b, q, dim), cdt)
    words = jax.random.normal(keys[1], (w, dim), cdt)
    idfs = jnp.abs(jax.random.normal(keys[2], (w,), jnp.float32))
    descs = jnp.abs(jax.random.normal(keys[3], (t, w), cdt))
    qmask = (jax.random.uniform(keys[0], (b, q)) > 0.3).astype(cdt)

    def assign(feats):
        return jax.vmap(
            lambda f: knn_search(f, words, k=k, metric="l2", approx=True)
        )(feats)

    d2, ids = jax.jit(assign)(feats)
    dists = jnp.sqrt(jnp.maximum(d2.astype(jnp.float32), 0.0))

    def tfidf_segment(ids, dists, qmask):
        return jax.vmap(
            lambda i, d, m: tfidf_mod.calc_tfidf(i, d, idfs, feature_mask=m)
        )(ids, dists, qmask)

    def tfidf_onehot(ids, dists, qmask):
        def one(i, d, m):
            n = i.shape[0]
            weights = jnp.ones_like(d)
            weights = weights / jnp.maximum(
                jnp.linalg.norm(weights, axis=1, keepdims=True), 1e-12
            )
            weights = weights * m[:, None]
            num = jnp.maximum(jnp.sum(m), 1.0)
            tf = (weights / num).reshape(-1)  # [Nk]
            onehot = (
                i.reshape(-1)[:, None] == jnp.arange(w, dtype=i.dtype)[None, :]
            ).astype(jnp.float32)  # [Nk, W]
            w_idf = onehot @ idfs  # [Nk] gather-free idf lookup
            return (tf * w_idf) @ onehot  # [W]

        return jax.vmap(one)(ids, dists, qmask)

    tv_seg = jax.jit(tfidf_segment)(ids, dists, qmask)
    tv_oh = jax.jit(tfidf_onehot)(ids, dists, qmask)
    err = float(jnp.max(jnp.abs(tv_seg - tv_oh)))
    print(f"segment-vs-onehot max abs diff: {err:.2e}")

    def cosine_topk(tv):
        qn = tv / jnp.maximum(
            jnp.linalg.norm(tv, axis=-1, keepdims=True), 1e-12
        )
        tn = descs / jnp.maximum(
            jnp.linalg.norm(descs, axis=-1, keepdims=True), 1e-12
        )
        sims = qn.astype(cdt) @ tn.T
        return jax.lax.top_k(sims, top_n)

    results = {
        "assign_words": device_time_scan(assign, feats),
        "tfidf_segment_sum": device_time_scan(tfidf_segment, ids, dists, qmask),
        "tfidf_onehot_matmul": device_time_scan(tfidf_onehot, ids, dists, qmask),
        "cosine_topk": device_time_scan(cosine_topk, tv_seg),
    }
    for name, sec in results.items():
        print(f"{name:24s} {sec * 1e3:8.3f} ms/batch-{b}")


if __name__ == "__main__":
    main()
