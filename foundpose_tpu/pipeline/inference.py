"""The end-to-end online pose pipeline as one batched, jitted function.

This is the TPU-native answer to the reference's per-instance Python hot loop
(reference: scripts/infer.py:368-733, call stack in SURVEY.md §3.1). The
entire chain —

    DINOv2 features -> masked query grid -> PCA projection ->
    tf-idf template retrieval -> cyclic-buddy matching -> RANSAC-PnP ->
    best-hypothesis selection

— traces into a single XLA program batched over detection crops, with zero
host round-trips (the reference crosses the device boundary at every faiss
search, at PCA, and at PnP; SURVEY.md §3.1 "process/device boundaries").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from foundpose_tpu import geometry
from foundpose_tpu.models import dinov2
from foundpose_tpu.ops import sampling
from foundpose_tpu.ops.pca import pca_transform
from foundpose_tpu.ops.tfidf import tfidf_retrieve
from foundpose_tpu.pose import corresp as corresp_mod
from foundpose_tpu.pose import pnp as pnp_mod
from foundpose_tpu.repre import ObjectRepre
from foundpose_tpu.structs import PinholeCamera

Array = jax.Array

_P = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Static pipeline options. Defaults follow the published LM-O setup
    (reference: configs/infer/lmo.json:1-25, scripts/infer.py:55-100)."""

    crop_size: Tuple[int, int] = (420, 420)
    grid_cell_size: float = 14.0
    # Random subsampling cap on valid query points
    # (reference: scripts/infer.py:484-492; default effectively unlimited).
    max_num_queries: int = 1000000
    top_n_templates: int = 5
    top_k_buddies: int = 300
    # Use TPU-optimized approximate top-k in the buddy selection.
    approx_topk: bool = False
    # 200, not the reference's 400 (configs/infer/lmo.json): 400 is
    # cv2.solvePnPRansac's adaptive-budget CAP, not a law, and our solver
    # adds LO-RANSAC refits of the running best hypothesis which recover
    # what extra random hypotheses would find. AR-gated on the cross-parity
    # world at 200 crops x 2 seeds (benchmarks/ransac_sweep.py): 200x2-LO is
    # AR-identical to 400x2-LO on both seeds (1.000/1.000 vs oracle
    # 0.995/1.000) while 100-iter cells lose 0.5-1.5 pt. Halves the solve
    # stage's hypothesis work. lmo_exact.json keeps 400 for strict
    # reference-budget parity runs.
    pnp_ransac_iter: int = 200
    # Two-phase solve: when > 0, template SELECTION runs a cheap RANSAC at
    # this hypothesis count over all top_n templates, and the full
    # `pnp_ransac_iter` budget is spent on the WINNER only (selection is by
    # pre-refinement inlier count in the reference too, pnp_util.py:77-79,
    # so only the selection signal is coarsened). 0 = single-pass (default;
    # the shipped configs keep single-pass unless benchmarked otherwise —
    # see benchmarks/select_iter_sweep.py for the AR gate).
    pnp_select_iter: int = 0
    pnp_inlier_thresh: float = 10.0
    pnp_refine_lm: bool = True
    lm_iters: int = 10
    # LO-RANSAC rounds on the winning template's pose (pose/pnp.lo_refine):
    # closes the measured quality gap vs cv2's internally-polished minimal
    # solver (benchmarks/cross_parity.py) at the cost of two overdetermined
    # DLT solves per crop.
    pnp_lo_iters: int = 2
    # Featuremetric refinement (paper stage; not in the reference OSS release).
    refine_featuremetric: bool = False
    featuremetric_iters: int = 8
    compute_dtype: Any = jnp.float32

    def __post_init__(self):
        # The two-phase knob must be loud when misconfigured: a
        # pnp_select_iter >= pnp_ransac_iter silently degrading to
        # single-pass would hide the expected +1-1.5 pt AR gain.
        if self.pnp_select_iter and not (
            0 < self.pnp_select_iter < self.pnp_ransac_iter
        ):
            raise ValueError(
                f"pnp_select_iter={self.pnp_select_iter} must be 0 "
                f"(single-pass) or in (0, pnp_ransac_iter="
                f"{self.pnp_ransac_iter})"
            )


class PoseOutputs(NamedTuple):
    """Batched pose estimates (leading axis = crops)."""

    success: Array  # [B] bool
    R_m2c: Array  # [B, 3, 3] model -> crop-camera
    t_m2c: Array  # [B, 3]
    R_m2w: Array  # [B, 3, 3] model -> world
    t_m2w: Array  # [B, 3]
    quality: Array  # [B] inlier count of the winning hypothesis
    score: Array  # [B] many-to-many-aware reprojection inlier ratio
    template_ids: Array  # [B, top_n] retrieved templates
    template_scores: Array  # [B, top_n]
    best_template: Array  # [B] winning template id
    per_template_quality: Array  # [B, top_n]
    num_queries: Array  # [B] valid query-point count
    # Winning template's correspondences (for visualization / diagnostics).
    best_corresp_2d: Array  # [B, K, 2]
    best_corresp_2d_ids: Array  # [B, K] query grid-point ids (for inlier ratios)
    best_corresp_3d: Array  # [B, K, 3]
    best_corresp_conf: Array  # [B, K]
    best_corresp_valid: Array  # [B, K]


def estimate_score(
    r: Array,
    t: Array,
    coord_2d: Array,
    coord_2d_ids: Array,
    coord_3d: Array,
    valid: Array,
    cam_f: Array,
    cam_c: Array,
    num_query_points: int,
    inlier_radius: float = 10.0,
) -> Array:
    """Many-to-many-aware inlier ratio: the fraction of unique query points
    with at least one correspondence whose reprojection error is within
    `inlier_radius`. This is the reference's submission score
    (reference: utils/eval_util.py:262-278). Fixed-shape via segment-max over
    the query-point ids.
    """
    cam = jnp.einsum("ij,nj->ni", r, coord_3d, precision=_P) + t
    z = jnp.where(jnp.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
    proj = cam[:, :2] / z * cam_f + cam_c
    err = jnp.linalg.norm(proj - coord_2d, axis=-1)
    inlier = ((err <= inlier_radius) & valid).astype(jnp.float32)
    present = valid.astype(jnp.float32)
    ids = coord_2d_ids.astype(jnp.int32)
    # segment_max yields -inf for empty segments; clamp to [0, 1].
    has_inlier = jnp.maximum(
        jax.ops.segment_max(inlier, ids, num_segments=num_query_points), 0.0
    )
    is_present = jnp.maximum(
        jax.ops.segment_max(present, ids, num_segments=num_query_points), 0.0
    )
    return jnp.sum(has_inlier * is_present) / jnp.maximum(jnp.sum(is_present), 1.0)


def query_features_from_map(
    feature_map: Array,
    mask: Array,
    crop_size: Tuple[int, int],
    grid_cell_size: float,
) -> Tuple[Array, Array, Array]:
    """Grid query points + sampled features + validity for one crop.

    (reference: scripts/infer.py:477-498; utils/feature_util.py:25-131)
    """
    points = sampling.grid_points(crop_size, grid_cell_size)
    valid = sampling.points_in_mask(points, mask)
    # Reshape fast path when the grid matches the feature map 1:1 (default
    # LM-O config); true bilinear sampling otherwise.
    feats = sampling.sample_grid_features(
        feature_map, points, crop_size, grid_cell_size
    )
    return points, feats, valid


def retrieve_batch(
    feature_maps: Array,
    masks: Array,
    repre: ObjectRepre,
    sub_keys: Array,
    config: InferenceConfig,
) -> Tuple[Array, Array, Array, Array]:
    """Stage A (vmapped over crops): query features + PCA + tf-idf retrieval.

    Returns (feats [B, Q, D], valid [B, Q] bool, template_ids [B, N],
    template_scores [B, N]).
    """
    cdt = config.compute_dtype

    def retrieve_crop(fmap, mask, crop_key):
        points, feats, valid = query_features_from_map(
            fmap, mask, config.crop_size, config.grid_cell_size
        )
        if config.max_num_queries < points.shape[0]:
            valid = sampling.subsample_points(
                points, valid, config.max_num_queries, crop_key
            )
        # PCA projection (one matmul; reference: scripts/infer.py:507-520).
        if repre.raw_projector is not None:
            feats = pca_transform(repre.raw_projector, feats)
        feats = feats.astype(cdt)
        validf = valid.astype(cdt)

        # tf-idf template retrieval (reference: template_util.py:126-176).
        template_ids, template_scores = tfidf_retrieve(
            feats,
            repre.word_centroids.astype(cdt),
            repre.word_idfs.astype(cdt),
            repre.template_descs.astype(cdt),
            top_n=config.top_n_templates,
            config=repre.tfidf_config,
            query_mask=validf,
            template_mask=repre.template_mask,
            approx_topk=config.approx_topk,
        )
        return feats, valid, template_ids, template_scores

    return jax.vmap(retrieve_crop)(feature_maps, masks, sub_keys)


def match_batch(
    feats_b: Array,
    valid_b: Array,
    template_ids_b: Array,
    template_scores_b: Array,
    repre: ObjectRepre,
    config: InferenceConfig,
):
    """Stage B: batched cyclic-buddy matching against the retrieved templates."""
    cdt = config.compute_dtype
    grid_pts = sampling.grid_points(config.crop_size, config.grid_cell_size)
    return corresp_mod.establish_correspondences_batch(
        grid_pts,
        feats_b,
        valid_b,
        template_ids_b,
        template_scores_b,
        repre.bank_feats.astype(cdt),
        repre.bank_vertices,
        repre.bank_mask,
        top_k=config.top_k_buddies,
        approx_topk=config.approx_topk,
    )


def resolve_select_iter(config: InferenceConfig) -> int:
    """Per-template hypothesis budget of the SELECTION pass: the cheap
    two-phase budget when set (validated in __post_init__), else the full
    single-pass budget."""
    return config.pnp_select_iter or config.pnp_ransac_iter


def full_budget_winner(
    r_best, t_best, inliers_best, quality_best,
    c2d, c3d, cvalid, cam_f, cam_c, key, config: InferenceConfig,
):
    """Second phase of the two-phase solve (no-op when single-pass).

    Reruns RANSAC at the FULL `pnp_ransac_iter` budget on the winning
    template's correspondences and keeps the better pose by inlier count —
    the full pass can only improve the winner. Shared by all four pipeline
    variants (solve_batch, multi_object.per_crop, both sharded steps) so
    the two-phase policy cannot drift between them. Measured (KERNELS §5):
    AR +1-1.5 pt on the harder sweep world at neutral end-to-end cost.
    """
    if resolve_select_iter(config) >= config.pnp_ransac_iter:
        return r_best, t_best, inliers_best, quality_best
    full = pnp_mod.ransac_pnp(
        c2d, c3d, cvalid, cam_f, cam_c, key,
        num_hypotheses=config.pnp_ransac_iter,
        inlier_thresh=config.pnp_inlier_thresh,
        refine_lm=False,
        lm_iters=config.lm_iters,
        lo_iters=0,
    )
    better = full.quality >= quality_best
    return (
        jnp.where(better, full.R, r_best),
        jnp.where(better, full.t, t_best),
        jnp.where(better, full.inliers, inliers_best),
        jnp.where(better, full.quality, quality_best),
    )


def refine_winner(
    r_best,
    t_best,
    inliers_best,
    count_best,
    c2d,
    c3d,
    cvalid,
    cam_f,
    cam_c,
    config: InferenceConfig,
    fmap=None,
    raw_projector=None,
    winner_bank=None,
):
    """Winner-only refinement chain: LO-RANSAC -> finite-guarded LM ->
    optional featuremetric.

    This is THE single implementation shared by all four pipeline variants
    (solve_batch below, multi_object.per_crop, and both sharded steps in
    parallel/sharded_inference) so the refinement policy cannot drift
    between them. Selection stays by the PRE-refinement inlier count in
    every variant (the reference also selects on solvePnPRansac's inlier
    set, pnp_util.py:77-79; RefineLM never feeds back into selection,
    scripts/infer.py:593-602), so refining only the winner is
    output-equivalent and top_n x cheaper.

    Args:
        r_best/t_best: the winning template's RANSAC pose.
        inliers_best/count_best: its inlier mask [N] and inlier count.
        c2d/c3d/cvalid: its correspondence set ([N,2], [N,3], [N] bool).
        fmap: the crop's raw feature map (featuremetric only).
        raw_projector: PCA projector applied to `fmap`, or None.
        winner_bank: () -> (vertices, feats, mask) for the winning
            template's registered features; only called (hence only traced)
            when config.refine_featuremetric — callers that gather the bank
            lazily pay nothing otherwise.

    Returns (r_best, t_best, count_best): the refined pose plus the
    POST-LO base-threshold inlier count, so callers report success/quality
    for the pose they actually emit. cv2's SOLVEPNP_ITERATIVE polishes
    inside RANSAC, so the reference's success is effectively post-polish
    too — a crop rescued by LO (pre-refit count < 6, post-refit >= 6)
    must count as a success (pnp_util.py:46-79). lo_refine is monotone in
    base-threshold count, so this can only flip failures to successes.
    """
    c2d32 = c2d.astype(jnp.float32)
    c3d32 = c3d.astype(jnp.float32)

    # LO-RANSAC refit of the winner only: template selection without LO
    # agrees 1.0 with the reference replica (benchmarks/cross_parity.py);
    # like LM, local optimization runs once, not top_n times (running it
    # per-template measured 6.3% end-to-end).
    if config.pnp_lo_iters > 0:
        r_best, t_best, inliers_best, count_best = pnp_mod.lo_refine(
            r_best, t_best, c2d32, c3d32, cvalid, cam_f, cam_c,
            inlier_thresh=config.pnp_inlier_thresh,
            iters=config.pnp_lo_iters,
            inliers=inliers_best,
            count=count_best,
        )

    # LM refinement of the winner only (reference: pnp_util.py:66-74), kept
    # only if it stayed finite (degenerate inlier sets can blow up the
    # normal equations).
    if config.pnp_refine_lm:
        r_ref, t_ref = pnp_mod.refine_pose_lm(
            r_best, t_best, c2d32, c3d32, inliers_best, cam_f, cam_c,
            iters=config.lm_iters,
        )
        ok = jnp.isfinite(r_ref).all() & jnp.isfinite(t_ref).all()
        r_best = jnp.where(ok, r_ref, r_best)
        t_best = jnp.where(ok, t_ref, t_best)

    # Optional featuremetric refinement against the dense (projected)
    # feature map, using the winning template's registered features
    # (paper stage; not in the reference OSS release).
    if config.refine_featuremetric:
        from foundpose_tpu.pose.featuremetric import refine_pose_featuremetric

        cdt = config.compute_dtype
        fmap_proj = (
            fmap if raw_projector is None else pca_transform(raw_projector, fmap)
        )
        verts, feats, mask = winner_bank()
        r_best, t_best, _ = refine_pose_featuremetric(
            r_best, t_best, fmap_proj.astype(cdt), cam_f, cam_c,
            verts, feats.astype(cdt), mask,
            crop_size=config.crop_size,
            iters=config.featuremetric_iters,
        )

    return r_best, t_best, count_best


def solve_batch(
    feature_maps: Array,
    valid_b: Array,
    template_ids_b: Array,
    template_scores_b: Array,
    cors_b,
    cameras: PinholeCamera,
    repre: ObjectRepre,
    crop_keys: Array,
    config: InferenceConfig,
) -> PoseOutputs:
    """Stage C (vmapped over crops): RANSAC-PnP + LM + best-hypothesis
    selection + world-frame conversion."""
    cdt = config.compute_dtype

    def per_crop(fmap, valid, template_ids, template_scores, cors, cam_f,
                 cam_c, crop_key):
        validf = valid.astype(cdt)
        # RANSAC-PnP per template hypothesis set — WITHOUT LM: selection is
        # by the pre-refinement inlier count in the reference too
        # (pnp_util.py:77-79 takes quality from solvePnPRansac's inlier set;
        # RefineLM never feeds back into it, scripts/infer.py:593-602), so
        # refining only the winning template below is output-equivalent and
        # 5x cheaper than refining every candidate.
        pnp_keys = jax.random.split(crop_key, config.top_n_templates + 1)
        results = jax.vmap(
            lambda c2, c3, v, k: pnp_mod.ransac_pnp(
                c2,
                c3,
                v,
                cam_f,
                cam_c,
                k,
                num_hypotheses=resolve_select_iter(config),
                inlier_thresh=config.pnp_inlier_thresh,
                refine_lm=False,
                lm_iters=config.lm_iters,
                lo_iters=0,
            )
        )(cors.coord_2d, cors.coord_3d, cors.valid, pnp_keys[:-1])

        # Best-by-inlier-count selection (reference: scripts/infer.py:593-602).
        quality = jnp.where(results.success, results.quality, -1.0)
        best = jnp.argmax(quality)
        # Two-phase solve second pass (no-op unless pnp_select_iter is set):
        # the full hypothesis budget runs on the WINNER only.
        r_best, t_best, inliers_best, quality_best = full_budget_winner(
            results.R[best], results.t[best], results.inliers[best],
            results.quality[best],
            cors.coord_2d[best], cors.coord_3d[best], cors.valid[best],
            cam_f, cam_c, pnp_keys[-1], config,
        )

        # Winner-only LO-RANSAC + LM + featuremetric — the shared
        # implementation (refine_winner above) used by all four variants.
        best_tid = template_ids[best]
        r_best, t_best, count_best = refine_winner(
            r_best, t_best, inliers_best, quality_best,
            cors.coord_2d[best], cors.coord_3d[best], cors.valid[best],
            cam_f, cam_c, config,
            fmap=fmap,
            raw_projector=repre.raw_projector,
            winner_bank=lambda: (
                repre.bank_vertices[best_tid],
                repre.bank_feats[best_tid],
                repre.bank_mask[best_tid],
            ),
        )

        # Submission score: many-to-many inlier ratio of the final pose
        # (reference: utils/eval_util.py:262-278).
        num_grid = int(config.crop_size[0] / config.grid_cell_size) * int(
            config.crop_size[1] / config.grid_cell_size
        )
        score = estimate_score(
            r_best,
            t_best,
            cors.coord_2d[best],
            cors.coord_2d_ids[best],
            cors.coord_3d[best],
            cors.valid[best],
            cam_f,
            cam_c,
            num_query_points=num_grid,
            inlier_radius=config.pnp_inlier_thresh,
        )

        # Success/quality are POST-refit (refine_winner docstring): LO can
        # rescue a sub-6-inlier winner exactly like cv2's internal polish.
        success_best = count_best >= 6.0
        return (
            success_best,
            r_best,
            t_best,
            jnp.where(success_best, count_best, -1.0),
            score,
            template_ids,
            template_scores,
            template_ids[best],
            results.quality,
            jnp.sum(validf),
            cors.coord_2d[best],
            cors.coord_2d_ids[best],
            cors.coord_3d[best],
            cors.coord_conf[best],
            cors.valid[best],
        )

    (
        success,
        r_m2c,
        t_m2c,
        quality,
        score,
        template_ids,
        template_scores,
        best_template,
        per_tpl_quality,
        num_queries,
        best_c2d,
        best_c2d_ids,
        best_c3d,
        best_conf,
        best_cvalid,
    ) = jax.vmap(per_crop)(
        feature_maps, valid_b, template_ids_b, template_scores_b, cors_b,
        cameras.f, cameras.c, crop_keys,
    )

    # Express poses in the world frame through the crop camera extrinsics
    # (reference: scripts/infer.py:658-666).
    t_c2w = cameras.T_world_from_eye
    m2c = geometry.as_4x4_rt(r_m2c, t_m2c)
    m2w = jnp.matmul(t_c2w, m2c, precision=jax.lax.Precision.HIGHEST)

    return PoseOutputs(
        success=success,
        R_m2c=r_m2c,
        t_m2c=t_m2c,
        R_m2w=m2w[..., :3, :3],
        t_m2w=m2w[..., :3, 3],
        quality=quality,
        score=score,
        template_ids=template_ids,
        template_scores=template_scores,
        best_template=best_template,
        per_template_quality=per_tpl_quality,
        num_queries=num_queries,
        best_corresp_2d=best_c2d,
        best_corresp_2d_ids=best_c2d_ids,
        best_corresp_3d=best_c3d,
        best_corresp_conf=best_conf,
        best_corresp_valid=best_cvalid,
    )


def pose_from_features(
    feature_maps: Array,
    masks: Array,
    cameras: PinholeCamera,
    repre: ObjectRepre,
    key: Array,
    config: InferenceConfig,
) -> PoseOutputs:
    """Retrieval + matching + PnP for a batch of crop feature maps.

    Composes the three stage functions (retrieve_batch / match_batch /
    solve_batch); they are exposed separately so benchmarks can time each
    stage as its own XLA program.

    Args:
        feature_maps: [B, Hf, Wf, D_raw].
        masks: [B, H, W] modal masks in crop space.
        cameras: batched crop cameras (leading dim B).
        repre: object representation (device-resident).
        key: PRNG key (hypothesis sampling).
    """
    b = feature_maps.shape[0]
    keys = jax.random.split(key, 2 * b)
    sub_keys, crop_keys = keys[:b], keys[b:]

    feats_b, valid_b, template_ids_b, template_scores_b = retrieve_batch(
        feature_maps, masks, repre, sub_keys, config
    )
    cors_b = match_batch(
        feats_b, valid_b, template_ids_b, template_scores_b, repre, config
    )
    return solve_batch(
        feature_maps, valid_b, template_ids_b, template_scores_b, cors_b,
        cameras, repre, crop_keys, config,
    )


def pose_from_crops(
    vit_params: Dict[str, Any],
    vit_cfg: dinov2.DinoV2Config,
    crops: Array,
    masks: Array,
    cameras: PinholeCamera,
    repre: ObjectRepre,
    key: Array,
    config: InferenceConfig,
) -> PoseOutputs:
    """Full online pipeline: images in, world-frame poses out (one XLA program).

    Args:
        crops: [B, H, W, 3] RGB — float in [0, 1], or uint8 (the CLI ships
            crops as uint8 to quarter the host->device transfer; same
            quantization as the reference's cv2.remap-on-uint8 path,
            scripts/infer.py:438-449) — already warped to the crop cameras.
        masks: [B, H, W] modal masks in crop space (any dtype; nonzero=valid).
    """
    if crops.dtype == jnp.uint8:
        crops = crops.astype(jnp.float32) / 255.0
    if masks.dtype != jnp.float32:
        masks = masks.astype(jnp.float32)
    images = dinov2.normalize_images(crops).astype(config.compute_dtype)
    out = dinov2.extract_facet(vit_params, vit_cfg, images)
    feature_maps = out["feature_maps"].astype(jnp.float32)
    return pose_from_features(feature_maps, masks, cameras, repre, key, config)


def pallas_interpret_token() -> bool:
    """Whether a `pltpu.force_tpu_interpret_mode()` context is active.

    Traces capture the interpret context, so a step memoized under interpret
    mode must not be served to compiled-mode callers (or vice versa) — the
    jit-factory memo caches below fold this into their key. Falls back to
    False if the (private) config state moves in a jax upgrade, which only
    costs the cache split, not correctness of fresh processes."""
    try:
        from jax._src import config as _jax_config

        return (
            _jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:
        return False


def jit_pose_from_crops(vit_cfg: dinov2.DinoV2Config, config: InferenceConfig):
    """Returns the jitted end-to-end step with static configs closed over.

    Memoized on the (frozen, hashable) configs plus the interpret context
    (pallas_interpret_token): repeated calls — one engine per request,
    repeated infer() runs in one process, the CLI bench's warm/timed passes
    — get the SAME jitted callable, so jax's executable cache is hit instead
    of re-tracing and re-compiling a fresh closure (a full recompile costs
    minutes on remote-compile backends)."""
    return _jit_pose_from_crops(vit_cfg, config, pallas_interpret_token())


@functools.lru_cache(maxsize=None)
def _jit_pose_from_crops(
    vit_cfg: dinov2.DinoV2Config, config: InferenceConfig, _interp: bool
):
    @jax.jit
    def step(vit_params, crops, masks, cameras, repre, key):
        return pose_from_crops(
            vit_params, vit_cfg, crops, masks, cameras, repre, key, config
        )

    return step
