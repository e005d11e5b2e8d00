"""Cyclic-buddy 2D-3D correspondence search.

TPU-native re-design of the reference correspondence engine
(reference: utils/corresp_util.py:34-169). Instead of two faiss index
round-trips per template, one masked distance matrix is computed on the MXU
and reduced with argmin in both directions; the top-k "cyclic buddies" are
selected with `lax.top_k`. Everything is fixed-shape: ragged query sets and
ragged per-template feature banks are handled with validity masks, so the
whole search vmaps over the retrieved templates and over detection crops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from foundpose_tpu.ops.knn import pairwise_sqdist
from foundpose_tpu.ops.selection import INVALID_SENTINEL, compact_smallest_k

Array = jax.Array

_INF = jnp.inf


def _compact_buddies(
    query_points: Array,
    cycle_dists: Array,
    q2o: Array,
    verts: Array,
    top_k: int,
):
    """Sort-free top-k buddy selection (the approx_topk path).

    `lax.approx_min_k` dominated the matching stage at k=300 of Q=900 (it is
    built for k << Q), and the subsequent id/vertex gathers serialize on TPU.
    This path selects via radix threshold + one-hot compaction
    (ops/selection.py): every per-buddy channel — distance, query id, object
    id, 2D point — compacts through ONE [Q, K] matmul, and the 3D vertices
    through a [K, F] one-hot matmul, with no sort and no gathers. Slots come
    out ordered by query index instead of by distance; downstream consumers
    (RANSAC sampling, scoring, score normalization) are order-agnostic.

    Args:
        cycle_dists: [Q] f32 with invalid entries >= INVALID_SENTINEL.
    Returns (coord_2d [K,2], q_ids [K], coord_3d [K,3], scores [K],
    dists [K], valid [K], o_ids [K]).
    """
    q = cycle_dists.shape[0]
    f = verts.shape[0]
    onehot, _ = compact_smallest_k(cycle_dists, top_k)  # [Q, K]
    chans = jnp.concatenate(
        [
            cycle_dists[:, None],
            jnp.arange(q, dtype=jnp.float32)[:, None],
            q2o.astype(jnp.float32)[:, None],
            query_points.astype(jnp.float32),
        ],
        axis=1,
    )  # [Q, 5]; ids are exact in f32 (Q, F << 2^24)
    comp = jax.lax.dot_general(
        onehot, chans, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, 5]
    bb_dists = comp[:, 0]
    q_ids = comp[:, 1].astype(jnp.int32)
    o_ids = comp[:, 2].astype(jnp.int32)
    coord_2d = comp[:, 3:5]
    valid = bb_dists < INVALID_SENTINEL * 0.5
    o_onehot = (
        o_ids[:, None] == jnp.arange(f, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # [K, F]
    coord_3d = jax.lax.dot_general(
        o_onehot, verts.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, 3]
    d_max = jnp.max(jnp.where(valid, bb_dists, -_INF))
    scores = jnp.where(valid, 1.0 - bb_dists / jnp.maximum(d_max, 1e-12), 0.0)
    return (
        coord_2d,
        q_ids,
        coord_3d,
        scores,
        jnp.where(valid, bb_dists, 0.0),
        valid,
        o_ids,
    )


class Correspondences(NamedTuple):
    """Fixed-size correspondence set for one (crop, template) pair.

    (reference dict fields: utils/corresp_util.py:139-156)
    """

    coord_2d: Array  # [K, 2] query-image coordinates
    coord_2d_ids: Array  # [K] indices into the query point grid
    coord_3d: Array  # [K] model-space 3D points
    coord_conf: Array  # [K] buddy scores in [0, 1]
    nn_vertex_ids: Array  # [K] indices into the object feature bank
    cycle_dists: Array  # [K] cyclic 2D distances
    valid: Array  # [K] bool — slots beyond the valid buddy count are padding
    template_id: Array  # [] retrieved template id
    template_score: Array  # [] retrieval cosine similarity


def cyclic_buddies(
    query_points: Array,
    query_feats: Array,
    query_mask: Array,
    object_feats: Array,
    object_mask: Array,
    top_k: int,
    approx_topk: bool = False,
) -> tuple[Array, Array, Array, Array, Array]:
    """Best buddies via cyclic 2D distance (Gupta et al., arXiv:2204.03635).

    query->object and object->query nearest neighbors are chained; the 2D
    distance between a query point and its cycle's landing point ranks the
    matches. (reference: utils/corresp_util.py:34-70)

    Returns (query_ids [K], object_ids [K], dists [K], scores [K], valid [K]).
    """
    d = pairwise_sqdist(query_feats, object_feats)  # [Q, F]
    d = jnp.where(query_mask[:, None], d, _INF)
    d = jnp.where(object_mask[None, :], d, _INF)

    q2o = jnp.argmin(d, axis=1)  # [Q] nearest object feature per query
    o2q = jnp.argmin(d, axis=0)  # [F] nearest query per object feature

    cycle_ids = o2q[q2o]  # [Q]
    u1 = query_points
    u2 = query_points[cycle_ids]
    cycle_dists = jnp.linalg.norm(u1 - u2, axis=-1)
    cycle_dists = jnp.where(query_mask, cycle_dists, _INF)

    if approx_topk:
        # Sort-free radix selection + one-hot compaction (see
        # _compact_buddies); buddies near the cut boundary are
        # interchangeable for RANSAC.
        cdm = jnp.where(query_mask, cycle_dists, INVALID_SENTINEL)
        dummy_verts = jnp.zeros((object_feats.shape[0], 3), jnp.float32)
        _, query_bb_ids, _, scores, bb_dists, valid, object_bb_ids = (
            _compact_buddies(query_points, cdm, q2o, dummy_verts, top_k)
        )
        return query_bb_ids, object_bb_ids, bb_dists, scores, valid
    neg, query_bb_ids = jax.lax.top_k(-cycle_dists, top_k)
    bb_dists = -neg
    valid = jnp.isfinite(bb_dists)
    # Score = 1 - d / d_max over the selected (valid) buddies
    # (reference: utils/corresp_util.py:63-65).
    d_max = jnp.max(jnp.where(valid, bb_dists, -_INF))
    scores = jnp.where(valid, 1.0 - bb_dists / jnp.maximum(d_max, 1e-12), 0.0)
    object_bb_ids = q2o[query_bb_ids]
    return query_bb_ids, object_bb_ids, jnp.where(valid, bb_dists, 0.0), scores, valid


def establish_correspondences_batch(
    query_points: Array,
    query_feats: Array,
    query_mask: Array,
    template_ids: Array,
    template_scores: Array,
    bank_feats: Array,
    bank_vertices: Array,
    bank_mask: Array,
    top_k: int,
    approx_topk: bool = False,
    use_kernel: bool | None = None,
) -> Correspondences:
    """Batched buddy correspondences for all crops x retrieved templates.

    Like `establish_correspondences` but over the whole crop batch at once.
    (A fused Pallas dual-argmin kernel existed for this stage in round 1 but
    measured SLOWER than the XLA path end-to-end — 240 vs 265 crops/s — and
    was removed; XLA's fusion of the [Q, F] distance matrix + dual argmin is
    already near HBM-bound for these shapes.)

    Args:
        query_points: [Q, 2] shared query grid.
        query_feats: [B, Q, D]; query_mask: [B, Q].
        template_ids/scores: [B, T'].
        bank_feats/vertices/mask: [T, F, ...] full per-object banks.
    Returns a Correspondences pytree with leading [B, T'] axes.
    """
    sel_feats = jnp.take(bank_feats, template_ids, axis=0)  # [B, T', F, D]
    sel_verts = jnp.take(bank_vertices, template_ids, axis=0)
    sel_mask = jnp.take(bank_mask, template_ids, axis=0)

    if approx_topk:
        if use_kernel is None:
            # Trace-time platform check (same convention as pose/pnp.py):
            # the fused kernel needs a TPU or the Pallas interpreter.
            use_kernel = jax.local_devices()[0].platform == "tpu"
        if use_kernel:
            from foundpose_tpu.ops.buddies_kernel import cycle_distances_fused

            cdm_bt, q2o_bt = cycle_distances_fused(
                query_feats, query_mask, query_points, sel_feats, sel_mask
            )  # [B, T', Q] each

            def finish_fused(cdm_i, q2o_i, verts, tid, tscore):
                (c2d, q_ids, c3d, scores, bb, valid, o_ids) = _compact_buddies(
                    query_points, cdm_i, q2o_i, verts, top_k
                )
                return Correspondences(
                    coord_2d=c2d,
                    coord_2d_ids=q_ids,
                    coord_3d=c3d,
                    coord_conf=scores,
                    nn_vertex_ids=o_ids,
                    cycle_dists=bb,
                    valid=valid,
                    template_id=tid,
                    template_score=tscore,
                )

            return jax.vmap(jax.vmap(finish_fused))(
                cdm_bt, q2o_bt, sel_verts, template_ids, template_scores
            )

    def pair(qf, qm, bf, bm):
        d = pairwise_sqdist(qf, bf)
        d = jnp.where(qm[:, None], d, _INF)
        d = jnp.where(bm[None, :], d, _INF)
        return jnp.argmin(d, axis=1), jnp.argmin(d, axis=0)

    q2o, o2q = jax.vmap(jax.vmap(pair, in_axes=(None, None, 0, 0)))(
        query_feats, query_mask, sel_feats, sel_mask
    )

    def finish(q2o_i, o2q_i, verts, tid, tscore, qmask):
        cycle_ids = o2q_i[q2o_i]  # [Q]
        u1 = query_points
        u2 = query_points[cycle_ids]
        cycle_dists = jnp.linalg.norm(u1 - u2, axis=-1)
        if approx_topk:
            cdm = jnp.where(qmask, cycle_dists, INVALID_SENTINEL)
            (coord_2d, q_ids, coord_3d, scores, bb_dists, valid, o_ids) = (
                _compact_buddies(query_points, cdm, q2o_i, verts, top_k)
            )
            return Correspondences(
                coord_2d=coord_2d,
                coord_2d_ids=q_ids,
                coord_3d=coord_3d,
                coord_conf=scores,
                nn_vertex_ids=o_ids,
                cycle_dists=bb_dists,
                valid=valid,
                template_id=tid,
                template_score=tscore,
            )
        cycle_dists = jnp.where(qmask, cycle_dists, _INF)
        neg, q_ids = jax.lax.top_k(-cycle_dists, top_k)
        bb_dists = -neg
        valid = jnp.isfinite(bb_dists)
        d_max = jnp.max(jnp.where(valid, bb_dists, -_INF))
        scores = jnp.where(valid, 1.0 - bb_dists / jnp.maximum(d_max, 1e-12), 0.0)
        o_ids = q2o_i[q_ids]
        return Correspondences(
            coord_2d=query_points[q_ids],
            coord_2d_ids=q_ids,
            coord_3d=verts[o_ids],
            coord_conf=scores,
            nn_vertex_ids=o_ids,
            cycle_dists=jnp.where(valid, bb_dists, 0.0),
            valid=valid,
            template_id=tid,
            template_score=tscore,
        )

    return jax.vmap(
        jax.vmap(finish, in_axes=(0, 0, 0, 0, 0, None))
    )(q2o, o2q, sel_verts, template_ids, template_scores, query_mask)


def establish_correspondences(
    query_points: Array,
    query_feats: Array,
    query_mask: Array,
    template_ids: Array,
    template_scores: Array,
    bank_feats: Array,
    bank_vertices: Array,
    bank_mask: Array,
    top_k: int,
    approx_topk: bool = False,
) -> Correspondences:
    """Buddy correspondences for every retrieved template of one crop.

    Args:
        query_points: [Q, 2]; query_feats: [Q, D]; query_mask: [Q].
        template_ids/scores: [T'] retrieval output.
        bank_feats: [T, F, D] padded per-template descriptor banks.
        bank_vertices: [T, F, 3] 3D point of each bank descriptor.
        bank_mask: [T, F] validity of bank rows.

    Returns a Correspondences pytree with a leading [T'] axis.
    (reference: utils/corresp_util.py:73-169)
    """

    def per_template(tid, tscore):
        feats = bank_feats[tid]
        verts = bank_vertices[tid]
        mask = bank_mask[tid]
        q_ids, o_ids, dists, scores, valid = cyclic_buddies(
            query_points, query_feats, query_mask, feats, mask, top_k,
            approx_topk=approx_topk,
        )
        return Correspondences(
            coord_2d=query_points[q_ids],
            coord_2d_ids=q_ids,
            coord_3d=verts[o_ids],
            coord_conf=scores,
            nn_vertex_ids=o_ids,
            cycle_dists=dists,
            valid=valid,
            template_id=tid,
            template_score=tscore,
        )

    return jax.vmap(per_template)(template_ids, template_scores)
