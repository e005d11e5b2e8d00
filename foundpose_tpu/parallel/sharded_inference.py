"""Multi-chip inference: DP over crops + bank-sharded template retrieval.

No reference counterpart (the reference is strictly single-device,
SURVEY.md §2.4); this is the TPU-native scale-out design:

- Detection crops are sharded over the `data` mesh axis (each device runs the
  ViT + matching for its shard of crops).
- The object's template descriptor bank is sharded over the `bank` axis:
  tf-idf retrieval computes local cosine scores + a local top-n per bank
  shard, merges with an `all_gather` over `bank` (a few KB), and fetches the
  winning templates' feature banks with a masked `psum` — the owner
  contributes its slice, everyone else zeros. All collectives ride ICI.
- Matching + RANSAC then run data-parallel on the gathered top-n banks.

Built on `shard_map` so the collective schedule is explicit and inspectable.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from foundpose_tpu import geometry
from foundpose_tpu.models import dinov2
from foundpose_tpu.ops import sampling
from foundpose_tpu.ops.pca import pca_transform
from foundpose_tpu.ops.tfidf import assign_words, calc_tfidf
from foundpose_tpu.parallel.mesh import BANK_AXIS, DATA_AXIS
from foundpose_tpu.pipeline import inference as inference_mod
from foundpose_tpu.pipeline.inference import (
    InferenceConfig,
    PoseOutputs,
    query_features_from_map,
)
from foundpose_tpu.pose import corresp as corresp_mod
from foundpose_tpu.pose import pnp as pnp_mod
from foundpose_tpu.repre import ObjectRepre
from foundpose_tpu.structs import PinholeCamera

Array = jax.Array


def _retrieve_sharded(
    feats: Array,
    validf: Array,
    word_centroids: Array,
    word_idfs: Array,
    template_descs_local: Array,
    top_n: int,
    tfidf_config,
    template_mask_local: Array | None = None,
) -> tuple[Array, Array]:
    """tf-idf retrieval with the template-descriptor bank sharded over BANK_AXIS.

    Returns global (template_ids [top_n], scores [top_n]) for one crop.
    """
    word_ids, word_dists = assign_words(
        feats, word_centroids, tfidf_config.knn_k, tfidf_config.metric
    )
    q = calc_tfidf(
        word_ids,
        word_dists,
        word_idfs,
        soft_assign=tfidf_config.soft_assign,
        soft_sigma_squared=tfidf_config.soft_sigma_squared,
        feature_mask=validf,
    )
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    tn = template_descs_local / jnp.maximum(
        jnp.linalg.norm(template_descs_local, axis=-1, keepdims=True), 1e-12
    )
    local_sims = tn @ qn  # [T_local]
    if template_mask_local is not None:
        local_sims = jnp.where(template_mask_local, local_sims, -jnp.inf)
    t_local = local_sims.shape[0]
    k = min(top_n, t_local)
    local_scores, local_ids = jax.lax.top_k(local_sims, k)

    # Merge across the bank axis: gather every shard's local top-k (tiny).
    my_shard = jax.lax.axis_index(BANK_AXIS)
    global_ids = local_ids + my_shard * t_local
    all_scores = jax.lax.all_gather(local_scores, BANK_AXIS).reshape(-1)
    all_ids = jax.lax.all_gather(global_ids, BANK_AXIS).reshape(-1)
    scores, sel = jax.lax.top_k(all_scores, top_n)
    return all_ids[sel], scores


def _fetch_banks(
    template_ids: Array,
    bank_feats_local: Array,
    bank_vertices_local: Array,
    bank_mask_local: Array,
) -> tuple[Array, Array, Array]:
    """Gathers the [top_n] selected templates' banks from the bank shards.

    The owner shard contributes its slice, others contribute zeros; a psum
    over BANK_AXIS broadcasts the result to all shards (a few MB over ICI).
    """
    t_local = bank_feats_local.shape[0]
    my_shard = jax.lax.axis_index(BANK_AXIS)

    def fetch_one(tid):
        owner = tid // t_local
        local_idx = tid % t_local
        is_mine = (owner == my_shard).astype(bank_feats_local.dtype)
        f = bank_feats_local[local_idx] * is_mine
        v = bank_vertices_local[local_idx] * is_mine
        m = bank_mask_local[local_idx].astype(bank_feats_local.dtype) * is_mine
        return f, v, m

    f, v, m = jax.vmap(fetch_one)(template_ids)
    f = jax.lax.psum(f, BANK_AXIS)
    v = jax.lax.psum(v, BANK_AXIS)
    m = jax.lax.psum(m, BANK_AXIS)
    return f, v, m > 0.5


def make_sharded_step(
    mesh: Mesh,
    vit_cfg: dinov2.DinoV2Config,
    config: InferenceConfig,
    repre: ObjectRepre,
    tensor_parallel: bool = False,
):
    """Builds the jitted multi-chip step for one object representation.

    Returns step(vit_params, crops, masks, cameras, key) -> PoseOutputs.
    Crops/masks/cameras must be placed with `mesh.crop_sharding`, the repre
    with `mesh.shard_repre`. The global batch must divide the data axis.

    With `tensor_parallel=True` the mesh must carry a third `model` axis and
    vit_params must be the factored+sharded tree from
    tp_vit.prepare_tp_params/shard_tp_params: the ViT then runs with heads
    and MLP hidden split over `model` (two psums per layer) while retrieval
    stays bank-sharded and crops data-sharded — the full (data, bank, model)
    composition. Post-ViT stages are model-replicated (activations are
    identical across `model` after the psums); the extractor is ~60% of the
    step, so this is the standard TP trade, not a schedule bug.
    """
    import dataclasses

    from jax import shard_map

    tfidf_config = repre.tfidf_config
    has_pca = repre.raw_projector is not None

    if tensor_parallel:
        from foundpose_tpu.parallel import tp_vit

        tp_vit.validate_tp(vit_cfg, mesh.shape[tp_vit.MODEL_AXIS])
        # The fused Pallas block computes a whole layer in one kernel, so the
        # two mid-layer psums of the TP split cannot be placed inside it.
        vit_cfg_run = dataclasses.replace(
            vit_cfg, use_fused_block=False, use_pallas_attention=False
        )
        vit_spec = tp_vit.tp_param_specs_from_cfg(vit_cfg)
    else:
        vit_cfg_run = vit_cfg
        vit_spec = P()

    def inner(vit_params, crops, masks, cam_f, cam_c, repre_arrays, key):
        (word_centroids, word_idfs, template_descs_local, template_valid_local,
         bank_feats_local, bank_vertices_local, bank_mask_local,
         raw_projector) = repre_arrays

        if crops.dtype == jnp.uint8:
            crops = crops.astype(jnp.float32) / 255.0
        if masks.dtype != jnp.float32:
            masks = masks.astype(jnp.float32)
        images = dinov2.normalize_images(crops).astype(config.compute_dtype)
        if tensor_parallel:
            from foundpose_tpu.parallel import tp_vit

            fmaps = tp_vit.tp_extract_local(vit_params, vit_cfg_run, images)[
                "feature_maps"
            ]
        else:
            fmaps = dinov2.extract_facet(vit_params, vit_cfg_run, images)[
                "feature_maps"
            ]
        fmaps = fmaps.astype(jnp.float32)

        # Same key derivation as inference.pose_from_features, sliced to this
        # data shard: GLOBAL crop i subsamples with keys_all[i] and draws PnP
        # hypotheses from keys_all[b_global + i], so the sharded step is
        # hypothesis-identical to the single-device pipeline.
        b_local = crops.shape[0]
        my_data = jax.lax.axis_index(DATA_AXIS)
        b_global = jax.lax.axis_size(DATA_AXIS) * b_local
        keys_all = jax.random.split(key, 2 * b_global)
        sub_keys = jax.lax.dynamic_slice_in_dim(
            keys_all, my_data * b_local, b_local
        )
        keys = jax.lax.dynamic_slice_in_dim(
            keys_all, b_global + my_data * b_local, b_local
        )

        def one(fmap, mask, kf, kc, sk, k):
            points, feats, valid = query_features_from_map(
                fmap, mask, config.crop_size, config.grid_cell_size
            )
            if config.max_num_queries < points.shape[0]:
                valid = sampling.subsample_points(
                    points, valid, config.max_num_queries, sk
                )
            if has_pca:
                feats = pca_transform(raw_projector, feats)
            validf = valid.astype(feats.dtype)
            template_ids, template_scores = _retrieve_sharded(
                feats, validf, word_centroids, word_idfs,
                template_descs_local, config.top_n_templates, tfidf_config,
                template_mask_local=template_valid_local,
            )
            sel_feats, sel_verts, sel_mask = _fetch_banks(
                template_ids, bank_feats_local, bank_vertices_local,
                bank_mask_local,
            )

            def per_template(bfeats, bverts, bmask, kk):
                q_ids, o_ids, _, conf, bvalid = corresp_mod.cyclic_buddies(
                    points, feats, valid, bfeats, bmask, config.top_k_buddies,
                    approx_topk=config.approx_topk,
                )
                # No LM here: selection is by the PRE-refinement inlier count
                # (same policy as pipeline/inference.py solve_batch; the
                # reference also selects on solvePnPRansac's inlier set,
                # pnp_util.py:77-79), so per-template LM would be top_n x
                # redundant work — the winner alone is refined below.
                res = pnp_mod.ransac_pnp(
                    points[q_ids], bverts[o_ids], bvalid, kf, kc, kk,
                    num_hypotheses=inference_mod.resolve_select_iter(config),
                    inlier_thresh=config.pnp_inlier_thresh,
                    refine_lm=False,
                    lm_iters=config.lm_iters,
                    lo_iters=0,
                )
                return res, points[q_ids], q_ids, bverts[o_ids], conf, bvalid

            ks = jax.random.split(k, config.top_n_templates + 1)
            results, c2d, c2d_ids, c3d, cconf, cvalid = jax.vmap(per_template)(
                sel_feats, sel_verts, sel_mask, ks[:-1]
            )
            quality = jnp.where(results.success, results.quality, -1.0)
            best = jnp.argmax(quality)
            # Two-phase solve second pass (shared helper; no-op unless
            # pnp_select_iter is set) — same policy as solve_batch.
            r_best, t_best, inliers_best, quality_best = (
                inference_mod.full_budget_winner(
                    results.R[best], results.t[best], results.inliers[best],
                    results.quality[best],
                    c2d[best], c3d[best], cvalid[best], kf, kc, ks[-1],
                    config,
                )
            )

            # Winner-only LO-RANSAC + LM + featuremetric — the shared
            # implementation (inference.refine_winner) used by all four
            # variants; the banks were already collectively fetched, so the
            # winner_bank closure just indexes them.
            r_best, t_best, count_best = inference_mod.refine_winner(
                r_best, t_best, inliers_best, quality_best,
                c2d[best], c3d[best], cvalid[best], kf, kc, config,
                fmap=fmap,
                raw_projector=raw_projector if has_pca else None,
                winner_bank=lambda: (
                    sel_verts[best], sel_feats[best], sel_mask[best]
                ),
            )

            num_grid = points.shape[0]
            score = inference_mod.estimate_score(
                r_best, t_best, c2d[best], c2d_ids[best],
                c3d[best], cvalid[best], kf, kc,
                num_query_points=num_grid,
                inlier_radius=config.pnp_inlier_thresh,
            )
            # Post-refit success/quality (inference.refine_winner docstring).
            success_best = count_best >= 6.0
            return (
                success_best, r_best, t_best,
                jnp.where(success_best, count_best, -1.0), score,
                template_ids, template_scores,
                template_ids[best], results.quality, jnp.sum(validf),
                c2d[best], c2d_ids[best], c3d[best], cconf[best],
                cvalid[best],
            )

        return jax.vmap(one)(fmaps, masks, cam_f, cam_c, sub_keys, keys)

    data_spec = P(DATA_AXIS)
    rep_spec = P()
    bank_spec = P(BANK_AXIS)

    shard_fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            vit_spec,  # vit params (replicated, or model-split under TP)
            data_spec,  # crops
            data_spec,  # masks
            data_spec,  # cam_f
            data_spec,  # cam_c
            (rep_spec, rep_spec, bank_spec, bank_spec, bank_spec, bank_spec,
             bank_spec, rep_spec),
            rep_spec,  # key
        ),
        out_specs=data_spec,
        check_vma=False,
    )

    # Pad-row validity (repre.pad_templates marks templates added for even
    # bank splits); all-true when the repre carries no mask.
    template_valid = repre.template_mask
    if template_valid is None:
        template_valid = jnp.ones((repre.template_descs.shape[0],), bool)

    @jax.jit
    def step(vit_params, crops, masks, cameras: PinholeCamera, key):
        repre_arrays = (
            repre.word_centroids, repre.word_idfs, repre.template_descs,
            template_valid,
            repre.bank_feats, repre.bank_vertices, repre.bank_mask,
            repre.raw_projector,
        )
        (success, r_m2c, t_m2c, quality, score, template_ids, template_scores,
         best_template, per_tpl_quality, num_queries,
         best_c2d, best_c2d_ids, best_c3d, best_conf, best_cvalid) = shard_fn(
            vit_params, crops, masks, cameras.f, cameras.c, repre_arrays, key
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

    return step


def make_object_mesh_step(mesh: Mesh, vit_cfg, config: InferenceConfig,
                          repre: ObjectRepre):
    """Pads + shards one object's repre on `mesh` and returns the jitted
    multi-chip step (tensor-parallel when the mesh carries a `model` axis).

    The single entry point for callers that hold an UNSHARDED repre — the
    infer CLI and the serving engine both build their mesh steps here so the
    padding/sharding/TP wiring cannot drift between them. ViT params must be
    placed separately with `prepare_mesh_vit_params` (they are shared across
    objects, the repre is not).
    """
    from foundpose_tpu.parallel import mesh as mesh_mod
    from foundpose_tpu.repre import pad_templates

    bank = mesh.shape[mesh_mod.BANK_AXIS]
    repre_s = mesh_mod.shard_repre(pad_templates(repre, bank), mesh)
    tp = mesh_mod.MODEL_AXIS in mesh.axis_names
    return make_sharded_step(mesh, vit_cfg, config, repre_s, tensor_parallel=tp)


def make_multi_object_mesh_step(mesh: Mesh, vit_cfg, config: InferenceConfig,
                                multi_repre: ObjectRepre):
    """Pads + shards a STACKED multi-object repre on `mesh` and returns the
    jitted mixed-object multi-chip step (tensor-parallel when the mesh
    carries a `model` axis) plus the sharded repre.

    The single entry point for callers holding an unsharded stacked repre —
    the infer CLI's multi_object path and the engine's estimate_mixed both
    build here so the padding/sharding/TP wiring cannot drift. ViT params
    must be placed separately with `prepare_mesh_vit_params`.
    """
    from foundpose_tpu.parallel import mesh as mesh_mod
    from foundpose_tpu.repre import pad_templates

    bank = mesh.shape[mesh_mod.BANK_AXIS]
    multi_s = mesh_mod.shard_repre_multi(pad_templates(multi_repre, bank), mesh)
    tp = mesh_mod.MODEL_AXIS in mesh.axis_names
    step = make_sharded_step_multi(
        mesh, vit_cfg, config, multi_s, tensor_parallel=tp
    )
    return step, multi_s


def prepare_mesh_vit_params(mesh: Mesh, vit_cfg, vit_params):
    """Places ViT params for `mesh`: factored + head/hidden-split over the
    `model` axis when present (parallel/tp_vit.py), unchanged otherwise.
    One-time per process — the placed tree serves every object's step."""
    from foundpose_tpu.parallel import mesh as mesh_mod

    if mesh_mod.MODEL_AXIS in mesh.axis_names:
        from foundpose_tpu.parallel import tp_vit

        return tp_vit.shard_tp_params(
            tp_vit.prepare_tp_params(vit_params, vit_cfg), mesh
        )
    return vit_params


def make_sharded_step_multi(
    mesh: Mesh,
    vit_cfg: dinov2.DinoV2Config,
    config: InferenceConfig,
    multi_repre: ObjectRepre,
    tensor_parallel: bool = False,
):
    """Multi-chip + multi-object step: crops of MANY objects share batches
    (each crop carries an object index into the stacked repre,
    pipeline/multi_object.py) while every object's template bank is sharded
    over the `bank` axis — the two scale-out axes compose.

    Returns step(vit_params, crops, masks, cameras, obj_idx, key). Place
    inputs with `mesh.crop_sharding`, the stacked repre with
    `mesh.shard_repre_multi`. obj_idx is [B] int32, data-sharded.

    With `tensor_parallel=True` the mesh must carry a third `model` axis and
    vit_params must come from tp_vit.prepare_tp_params/shard_tp_params (the
    same factored tree prepare_mesh_vit_params produces): the ViT runs with
    heads/MLP hidden split over `model` (two psums per layer), completing
    the (data, bank, model) composition for mixed-object batches — the
    vitg14 deployment (reference treats it as a first-class extractor,
    utils/dinov2_utils.py:81-84) no longer forfeits mixed-object batching.
    Post-ViT stages are model-replicated, same trade as make_sharded_step.
    """
    import dataclasses

    from jax import shard_map

    tfidf_config = multi_repre.tfidf_config
    has_pca = multi_repre.raw_projector is not None

    if tensor_parallel:
        from foundpose_tpu.parallel import tp_vit

        tp_vit.validate_tp(vit_cfg, mesh.shape[tp_vit.MODEL_AXIS])
        # The fused Pallas block computes a whole layer in one kernel, so the
        # two mid-layer psums of the TP split cannot be placed inside it.
        vit_cfg_run = dataclasses.replace(
            vit_cfg, use_fused_block=False, use_pallas_attention=False
        )
        vit_spec = tp_vit.tp_param_specs_from_cfg(vit_cfg)
    else:
        vit_cfg_run = vit_cfg
        vit_spec = P()

    def inner(vit_params, crops, masks, cam_f, cam_c, obj_idx, repre_arrays,
              key):
        (word_centroids, word_idfs, template_descs_local, template_mask_local,
         bank_feats_local, bank_vertices_local, bank_mask_local,
         raw_projector) = repre_arrays

        if crops.dtype == jnp.uint8:
            crops = crops.astype(jnp.float32) / 255.0
        if masks.dtype != jnp.float32:
            masks = masks.astype(jnp.float32)
        images = dinov2.normalize_images(crops).astype(config.compute_dtype)
        if tensor_parallel:
            from foundpose_tpu.parallel import tp_vit

            fmaps = tp_vit.tp_extract_local(vit_params, vit_cfg_run, images)[
                "feature_maps"
            ]
        else:
            fmaps = dinov2.extract_facet(vit_params, vit_cfg_run, images)[
                "feature_maps"
            ]
        fmaps = fmaps.astype(jnp.float32)

        # Same key derivation as the other pipeline variants (see
        # make_sharded_step): sub_keys = keys_all[:b_global],
        # pnp keys = keys_all[b_global:], sliced per data shard.
        b_local = crops.shape[0]
        my_data = jax.lax.axis_index(DATA_AXIS)
        b_global = jax.lax.axis_size(DATA_AXIS) * b_local
        keys_all = jax.random.split(key, 2 * b_global)
        sub_keys = jax.lax.dynamic_slice_in_dim(
            keys_all, my_data * b_local, b_local
        )
        keys = jax.lax.dynamic_slice_in_dim(
            keys_all, b_global + my_data * b_local, b_local
        )

        def one(fmap, mask, kf, kc, oi, sk, k):
            points, feats, valid = query_features_from_map(
                fmap, mask, config.crop_size, config.grid_cell_size
            )
            if config.max_num_queries < points.shape[0]:
                valid = sampling.subsample_points(
                    points, valid, config.max_num_queries, sk
                )
            proj = None
            if has_pca:
                proj = jax.tree.map(lambda a: a[oi], raw_projector)
                feats = pca_transform(proj, feats)
            validf = valid.astype(feats.dtype)
            # Gather this crop's object tables; bank-sharded arrays keep
            # their local template slice ([O, T_local, ...] -> [T_local, ...]).
            template_ids, template_scores = _retrieve_sharded(
                feats, validf, word_centroids[oi], word_idfs[oi],
                template_descs_local[oi], config.top_n_templates, tfidf_config,
                template_mask_local=template_mask_local[oi],
            )
            sel_feats, sel_verts, sel_mask = _fetch_banks(
                template_ids, bank_feats_local[oi], bank_vertices_local[oi],
                bank_mask_local[oi],
            )

            def per_template(bfeats, bverts, bmask, kk):
                q_ids, o_ids, _, conf, bvalid = corresp_mod.cyclic_buddies(
                    points, feats, valid, bfeats, bmask, config.top_k_buddies,
                    approx_topk=config.approx_topk,
                )
                # No LM here — winner-only refinement below, matching the
                # single-chip and single-object-sharded paths.
                res = pnp_mod.ransac_pnp(
                    points[q_ids], bverts[o_ids], bvalid, kf, kc, kk,
                    num_hypotheses=inference_mod.resolve_select_iter(config),
                    inlier_thresh=config.pnp_inlier_thresh,
                    refine_lm=False,
                    lm_iters=config.lm_iters,
                    lo_iters=0,
                )
                return res, points[q_ids], q_ids, bverts[o_ids], conf, bvalid

            ks = jax.random.split(k, config.top_n_templates + 1)
            results, c2d, c2d_ids, c3d, cconf, cvalid = jax.vmap(per_template)(
                sel_feats, sel_verts, sel_mask, ks[:-1]
            )
            quality = jnp.where(results.success, results.quality, -1.0)
            best = jnp.argmax(quality)
            # Two-phase solve second pass (shared helper; no-op unless
            # pnp_select_iter is set) — same policy as solve_batch.
            r_best, t_best, inliers_best, quality_best = (
                inference_mod.full_budget_winner(
                    results.R[best], results.t[best], results.inliers[best],
                    results.quality[best],
                    c2d[best], c3d[best], cvalid[best], kf, kc, ks[-1],
                    config,
                )
            )

            # Winner-only LO-RANSAC + LM + featuremetric — the shared
            # implementation (inference.refine_winner) used by all four
            # variants.
            r_best, t_best, count_best = inference_mod.refine_winner(
                r_best, t_best, inliers_best, quality_best,
                c2d[best], c3d[best], cvalid[best], kf, kc, config,
                fmap=fmap,
                raw_projector=proj,
                winner_bank=lambda: (
                    sel_verts[best], sel_feats[best], sel_mask[best]
                ),
            )

            num_grid = points.shape[0]
            score = inference_mod.estimate_score(
                r_best, t_best, c2d[best], c2d_ids[best], c3d[best],
                cvalid[best], kf, kc, num_query_points=num_grid,
                inlier_radius=config.pnp_inlier_thresh,
            )
            # Post-refit success/quality (inference.refine_winner docstring).
            success_best = count_best >= 6.0
            return (
                success_best, r_best, t_best,
                jnp.where(success_best, count_best, -1.0), score,
                template_ids, template_scores,
                template_ids[best], results.quality, jnp.sum(validf),
                c2d[best], c2d_ids[best], c3d[best], cconf[best],
                cvalid[best],
            )

        return jax.vmap(one)(fmaps, masks, cam_f, cam_c, obj_idx, sub_keys, keys)

    data_spec = P(DATA_AXIS)
    rep_spec = P()
    # Stacked-repre arrays: leading object axis replicated, template axis
    # sharded over `bank`.
    obj_bank_spec = P(None, BANK_AXIS)

    shard_fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            vit_spec,   # vit params (replicated, or model-split under TP)
            data_spec,  # crops
            data_spec,  # masks
            data_spec,  # cam_f
            data_spec,  # cam_c
            data_spec,  # obj_idx
            (rep_spec, rep_spec, obj_bank_spec, obj_bank_spec, obj_bank_spec,
             obj_bank_spec, obj_bank_spec, rep_spec),
            rep_spec,   # key
        ),
        out_specs=data_spec,
        check_vma=False,
    )

    @jax.jit
    def step(vit_params, crops, masks, cameras: PinholeCamera, obj_idx, key):
        template_mask = multi_repre.template_mask
        if template_mask is None:
            template_mask = jnp.ones(
                multi_repre.template_descs.shape[:2], dtype=bool
            )
        repre_arrays = (
            multi_repre.word_centroids, multi_repre.word_idfs,
            multi_repre.template_descs, template_mask,
            multi_repre.bank_feats, multi_repre.bank_vertices,
            multi_repre.bank_mask, multi_repre.raw_projector,
        )
        (success, r_m2c, t_m2c, quality, score, template_ids, template_scores,
         best_template, per_tpl_quality, num_queries,
         best_c2d, best_c2d_ids, best_c3d, best_conf, best_cvalid) = shard_fn(
            vit_params, crops, masks, cameras.f, cameras.c, obj_idx,
            repre_arrays, key,
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

    return step
