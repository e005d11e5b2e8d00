"""Mixed-object batched inference: one jitted step over crops of MANY objects.

Design-target component with no reference counterpart (the reference runs a
sequential per-object loop, scripts/infer.py:179): all object representations
are stacked into one padded multi-object repre (repre.stack_repres) and each
crop carries its object index — the pipeline gathers the right codebook /
descriptor bank per crop inside the same XLA program, so one batch can mix
detections of different objects (full-image inference in one step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from foundpose_tpu import geometry
from foundpose_tpu.models import dinov2
from foundpose_tpu.ops import sampling
from foundpose_tpu.ops.pca import pca_transform
from foundpose_tpu.ops.tfidf import tfidf_retrieve
from foundpose_tpu.pipeline.inference import (
    InferenceConfig,
    PoseOutputs,
    estimate_score,
    full_budget_winner,
    query_features_from_map,
    refine_winner,
    resolve_select_iter,
)
from foundpose_tpu.pose import corresp as corresp_mod
from foundpose_tpu.pose import pnp as pnp_mod
from foundpose_tpu.repre import ObjectRepre
from foundpose_tpu.structs import PinholeCamera

Array = jax.Array


def pose_from_features_multi(
    feature_maps: Array,
    masks: Array,
    cameras: PinholeCamera,
    obj_idx: Array,
    multi_repre: ObjectRepre,
    key: Array,
    config: InferenceConfig,
) -> PoseOutputs:
    """Like inference.pose_from_features, but each crop selects its object.

    Args:
        obj_idx: [B] int index into the stacked multi-object repre.
        multi_repre: output of repre.stack_repres (leading object axis on all
            array fields).
    """
    b = feature_maps.shape[0]
    cdt = config.compute_dtype

    def per_crop(fmap, mask, cam_f, cam_c, oi, sub_key, crop_key):
        # Gather this crop's object tables (XLA lowers to HBM gathers).
        words = multi_repre.word_centroids[oi].astype(cdt)
        idfs = multi_repre.word_idfs[oi].astype(cdt)
        descs = multi_repre.template_descs[oi].astype(cdt)
        bank_feats = multi_repre.bank_feats[oi]
        bank_vertices = multi_repre.bank_vertices[oi]
        bank_mask = multi_repre.bank_mask[oi]
        template_mask = (
            multi_repre.template_mask[oi]
            if multi_repre.template_mask is not None
            else None
        )

        points, feats, valid = query_features_from_map(
            fmap, mask, config.crop_size, config.grid_cell_size
        )
        if config.max_num_queries < points.shape[0]:
            valid = sampling.subsample_points(
                points, valid, config.max_num_queries, sub_key
            )
        proj = None
        if multi_repre.raw_projector is not None:
            proj = jax.tree.map(lambda a: a[oi], multi_repre.raw_projector)
            feats = pca_transform(proj, feats)
        feats = feats.astype(cdt)
        validf = valid.astype(cdt)

        template_ids, template_scores = tfidf_retrieve(
            feats, words, idfs, descs,
            top_n=config.top_n_templates,
            config=multi_repre.tfidf_config,
            query_mask=validf,
            template_mask=template_mask,
            approx_topk=config.approx_topk,
        )
        cors = corresp_mod.establish_correspondences(
            points, feats, valid, template_ids, template_scores,
            bank_feats.astype(cdt), bank_vertices, bank_mask,
            top_k=config.top_k_buddies,
            approx_topk=config.approx_topk,
        )
        # No per-template LM: selection is by the PRE-refinement inlier count
        # (identical policy in all four pipeline variants; see
        # inference.solve_batch), the winner alone is refined below.
        pnp_keys = jax.random.split(crop_key, config.top_n_templates + 1)
        results = jax.vmap(
            lambda c2, c3, v, k: pnp_mod.ransac_pnp(
                c2, c3, v, cam_f, cam_c, k,
                num_hypotheses=resolve_select_iter(config),
                inlier_thresh=config.pnp_inlier_thresh,
                refine_lm=False,
                lm_iters=config.lm_iters,
                lo_iters=0,
            )
        )(cors.coord_2d, cors.coord_3d, cors.valid, pnp_keys[:-1])
        quality = jnp.where(results.success, results.quality, -1.0)
        best = jnp.argmax(quality)
        # Two-phase solve second pass (shared helper; no-op unless
        # pnp_select_iter is set) — same policy as solve_batch.
        r_best, t_best, inliers_best, quality_best = full_budget_winner(
            results.R[best], results.t[best], results.inliers[best],
            results.quality[best],
            cors.coord_2d[best], cors.coord_3d[best], cors.valid[best],
            cam_f, cam_c, pnp_keys[-1], config,
        )

        # Winner-only LO-RANSAC + LM + featuremetric — the shared
        # implementation (inference.refine_winner) used by all four variants.
        best_tid = template_ids[best]
        r_best, t_best, count_best = refine_winner(
            r_best, t_best, inliers_best, quality_best,
            cors.coord_2d[best], cors.coord_3d[best], cors.valid[best],
            cam_f, cam_c, config,
            fmap=fmap,
            raw_projector=proj,
            winner_bank=lambda: (
                bank_vertices[best_tid],
                bank_feats[best_tid],
                bank_mask[best_tid],
            ),
        )

        num_grid = points.shape[0]
        score = estimate_score(
            r_best, t_best, cors.coord_2d[best],
            cors.coord_2d_ids[best], cors.coord_3d[best], cors.valid[best],
            cam_f, cam_c, num_query_points=num_grid,
            inlier_radius=config.pnp_inlier_thresh,
        )
        # Post-refit success/quality (see inference.refine_winner docstring).
        success_best = count_best >= 6.0
        return (
            success_best, r_best, t_best,
            jnp.where(success_best, count_best, -1.0), score,
            template_ids, template_scores,
            template_ids[best], results.quality, jnp.sum(validf),
            cors.coord_2d[best], cors.coord_2d_ids[best], cors.coord_3d[best],
            cors.coord_conf[best], cors.valid[best],
        )

    # Same key derivation as inference.pose_from_features: crop i's
    # subsample key is keys[i], its PnP key keys[b + i] — the pipeline
    # variants draw identical hypotheses on identical inputs.
    keys = jax.random.split(key, 2 * b)
    sub_keys, crop_keys = keys[:b], keys[b:]
    (success, r_m2c, t_m2c, quality, score, template_ids, template_scores,
     best_template, per_tpl_quality, num_queries,
     best_c2d, best_c2d_ids, best_c3d, best_conf, best_cvalid) = jax.vmap(per_crop)(
        feature_maps, masks, cameras.f, cameras.c, obj_idx, sub_keys, crop_keys
    )

    m2c = geometry.as_4x4_rt(r_m2c, t_m2c)
    m2w = jnp.matmul(
        cameras.T_world_from_eye, m2c, precision=jax.lax.Precision.HIGHEST
    )
    return PoseOutputs(
        success=success, R_m2c=r_m2c, t_m2c=t_m2c,
        R_m2w=m2w[..., :3, :3], t_m2w=m2w[..., :3, 3],
        quality=quality, score=score, template_ids=template_ids,
        template_scores=template_scores, best_template=best_template,
        per_template_quality=per_tpl_quality, num_queries=num_queries,
        best_corresp_2d=best_c2d, best_corresp_2d_ids=best_c2d_ids,
        best_corresp_3d=best_c3d,
        best_corresp_conf=best_conf, best_corresp_valid=best_cvalid,
    )


def jit_pose_from_crops_multi(vit_cfg: dinov2.DinoV2Config, config: InferenceConfig):
    """Jitted image->pose step over mixed-object batches. Memoized like
    inference.jit_pose_from_crops (same uint8-crop contract; the memo key
    includes the Pallas interpret context, see pallas_interpret_token)."""
    from foundpose_tpu.pipeline.inference import pallas_interpret_token

    return _jit_pose_from_crops_multi(vit_cfg, config, pallas_interpret_token())


@functools.lru_cache(maxsize=None)
def _jit_pose_from_crops_multi(
    vit_cfg: dinov2.DinoV2Config, config: InferenceConfig, _interp: bool
):
    @jax.jit
    def step(vit_params, crops, masks, cameras, obj_idx, multi_repre, key):
        if crops.dtype == jnp.uint8:
            crops = crops.astype(jnp.float32) / 255.0
        if masks.dtype != jnp.float32:
            masks = masks.astype(jnp.float32)
        images = dinov2.normalize_images(crops).astype(config.compute_dtype)
        fmaps = dinov2.extract_facet(vit_params, vit_cfg, images)["feature_maps"]
        return pose_from_features_multi(
            fmaps.astype(jnp.float32), masks, cameras, obj_idx, multi_repre,
            key, config,
        )

    return step
