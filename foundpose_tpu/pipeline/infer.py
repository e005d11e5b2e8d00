"""Online inference CLI: BOP test images -> coarse 6DoF poses -> results JSON.

Re-design of the reference inference script
(reference: scripts/infer.py:55-827, call stack in SURVEY.md §3.1). The
per-instance Python hot loop becomes host-side batch assembly + one jitted
TPU program per batch:

  host:   detections -> crop boxes -> crop cameras -> batched warps
  device: ViT features -> PCA -> tf-idf retrieval -> cyclic buddies ->
          RANSAC-PnP -> best pose            (pipeline/inference.py)
  host:   EvaluatorPose accumulation -> estimated-poses.json

Instances from many test images batch together, so the TPU sees a steady
stream of fixed-shape work regardless of how many detections each image has.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from foundpose_tpu import cameras as cam_mod
from foundpose_tpu.data import bop, detections as det_mod
from foundpose_tpu.eval.evaluator import EvaluatorPose
from foundpose_tpu.models import dinov2, weights as weights_mod
from foundpose_tpu.parallel import host_shard
from foundpose_tpu.pipeline import inference
from foundpose_tpu.repre import load_repre
from foundpose_tpu.structs import PinholeCamera
from foundpose_tpu.utils import config as config_util
from foundpose_tpu.utils.logging_util import get_logger, log_heading

logger = get_logger()


@dataclasses.dataclass(frozen=True)
class InferOpts:
    """(reference: scripts/infer.py:55-100 + configs/infer/lmo.json)"""

    version: str = "v1"
    repre_version: str = "v1"
    object_dataset: str = "lmo"
    object_lids: Optional[List[int]] = None
    max_sym_disc_step: float = 0.01

    crop: bool = True
    crop_rel_pad: float = 0.2
    crop_size: Tuple[int, int] = (420, 420)

    use_detections: bool = True
    num_preds_factor: float = 1.0
    min_visibility: float = 0.1

    extractor_name: str = (
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
    )
    grid_cell_size: float = 14.0
    max_num_queries: int = 1000000
    weights_path: Optional[str] = None

    match_template_type: str = "tfidf"
    match_top_n_templates: int = 5
    match_feat_matching_type: str = "cyclic_buddies"
    match_top_k_buddies: int = 300

    pnp_type: str = "ransac_dlt"
    # 200 (not the reference's 400, which is cv2's adaptive-budget cap):
    # AR-gated at 2 seeds x 200 crops on the cross-parity world — see the
    # rationale on InferenceConfig.pnp_ransac_iter and
    # benchmarks/ransac_sweep.py. lmo_exact.json pins 400.
    pnp_ransac_iter: int = 200
    # Two-phase solve (inference.full_budget_winner): > 0 runs template
    # SELECTION at this cheap hypothesis budget and the full
    # pnp_ransac_iter on the winner only. Measured AR +1-1.5 pt at neutral
    # device cost (docs/KERNELS.md section 5); 0 = single-pass default.
    pnp_select_iter: int = 0
    pnp_required_ransac_conf: float = 0.99
    pnp_inlier_thresh: float = 10.0
    pnp_refine_lm: bool = True
    # LO-RANSAC rounds on the winning template (pose/pnp.lo_refine); 0 turns
    # the local-optimization stage off entirely.
    pnp_lo_iters: int = 2
    refine_featuremetric: bool = False

    final_pose_type: str = "best_coarse"

    # TPU-native performance options.
    use_pallas_attention: bool = False
    # Fused transformer-block Pallas kernel (ops/vit_block.py; ViT-S 47 ->
    # 28 ms/batch-64 on v5e) and tanh GELU (deviation 5e-4; see DinoV2Config).
    use_fused_block: bool = False
    approx_gelu: bool = False
    approx_topk: bool = False
    # "float32" | "bfloat16": bf16 also casts the repre banks at rest
    # (halves their HBM + gather traffic; AR-level equivalence tested in
    # tests/test_fastpath_ar.py).
    compute_dtype: str = "float32"
    # Mixed-object batching: one jitted step over a stacked multi-object
    # repre, so detections of different objects share batches
    # (pipeline/multi_object.py; no reference counterpart).
    multi_object: bool = False

    batch_size: int = 16
    save_estimates: bool = True
    vis_results: bool = False
    vis_count: int = 10
    vis_corresp_top_n: int = 100
    vis_feat_map: bool = True
    vis_for_paper: bool = True
    # Skip objects whose estimated-poses.json already exists (coarse-grained
    # resume; the reference only resumes at whole-stage granularity,
    # SURVEY.md §5.4).
    resume: bool = False
    debug: bool = False

    # Multi-host dataset sharding (parallel/host_shard.py; SURVEY §5.8c —
    # no reference counterpart, the reference is single-process): this
    # process handles every shard_count-th (scene, image) key and writes
    # shard-suffixed artifacts which prepare_bop_submission merges.
    # shard_count=0 resolves from jax.process_index()/process_count().
    shard_index: int = 0
    shard_count: int = 1

    # Multi-CHIP execution (parallel/sharded_inference.py; no reference
    # counterpart): shape of a (data, bank) or (data, bank, model) device
    # mesh over jax.devices(). None = single-chip jitted path. Crops shard
    # over `data` (batch_size must divide the data axis), each object's
    # template bank over `bank` (padded to an even split via
    # repre.pad_templates), and with a 3rd axis the ViT runs
    # tensor-parallel (parallel/tp_vit.py; single- AND multi-object paths).
    mesh_shape: Optional[Tuple[int, ...]] = None

    # Injection seams (no reference counterpart): `vit_overrides` patches
    # fields of the parsed DinoV2Config (dataclasses.replace semantics,
    # e.g. {"embed_dim": 32, "depth": 2} for tiny test ViTs or
    # {"softmax_stabilizer": "capped"} for kernel sweeps) and
    # `dataset_crop_size` overrides the dataset's default center-crop in
    # prepare_sample — so tests/experiments configure through opts instead
    # of monkey-patching module globals.
    vit_overrides: Optional[Dict[str, Any]] = None
    dataset_crop_size: Optional[Tuple[int, int]] = None

    bop_root: str = ""
    repre_dir: str = ""
    detections_path: str = ""
    output_dir: str = ""


@dataclasses.dataclass
class PendingInstance:
    """Host-side record for one detection crop awaiting the batched step."""

    scene_id: int
    im_id: int
    inst_id: int
    obj_id: int
    det_score: float
    det_time: float
    orig_camera: PinholeCamera
    crop_camera: PinholeCamera
    crop_image: np.ndarray
    crop_mask: np.ndarray
    gt: Optional[bop.GtAnnotation]
    times: Dict[str, float]
    # Detection-vs-GT visible-mask IoU in the original image (reference
    # accumulates mask IoU per estimate, utils/eval_util.py:170-190).
    mask_iou: Optional[float] = None


def make_warp_fn(crop_size: Tuple[int, int]):
    """Jitted single-image -> many-crop-cameras warp (the image enters the
    program ONCE; only masks/cameras are batched, so no [n, H, W, 3] image
    replicas are staged — replaces the per-instance cv2.remap calls,
    reference: scripts/infer.py:438-449). Shared with the serving engine via
    ops/warp.make_single_image_warp."""
    from foundpose_tpu.ops.warp import make_single_image_warp

    return make_single_image_warp(crop_size)


def prepare_instance_crops(
    sample: bop.Sample,
    instances: List[det_mod.Detection],
    opts: InferOpts,
    warp_batch,
) -> List[PendingInstance]:
    """Builds crop cameras + warped crops for all detections of one image."""
    import jax
    import jax.numpy as jnp

    if not instances:
        return []
    h, w = sample.image.shape[:2]
    # uint8 end to end: the warp quantizes its f32 result back to uint8
    # (same as the reference's cv2.remap on uint8, scripts/infer.py:438-449)
    # and pose_from_crops normalizes on device — 4x less host<->device
    # traffic for the image, crops and masks than the old f32 flow.
    if sample.image.dtype == np.uint8:
        image = sample.image
    else:
        # Float images: accept both the [0, 1] and raw [0, 255] conventions
        # (bop.prepare_sample always yields uint8; this branch is for
        # programmatic callers). Round (not truncate) for parity with the
        # warp's own re-quantization.
        imf = np.asarray(sample.image, dtype=np.float32)
        if imf.size and float(imf.max()) > 1.0:
            imf = imf / 255.0
        image = np.clip(np.round(imf * 255.0), 0, 255).astype(np.uint8)

    kept = []
    t0 = time.perf_counter()
    half_image = 0.5 * h * w
    for det in instances:
        # Skip degenerate detections covering more than half of the
        # image (reference: scripts/infer.py:389-393, e.g. itodd false
        # positives).
        if det.mask is not None and det.mask.sum() > half_image:
            continue
        kept.append(det)
    if not kept:
        return []
    # Crop-camera math runs BATCHED on the CPU backend: one vectorized
    # build_crop_cameras call whose eager op count is constant in the
    # detection count — the old per-box loop paid per-dispatch cost x N x
    # ops, the pathology measured at ~161 ms/instance host prep in
    # benchmarks/cli_throughput.py (parity: tests/test_cameras.py).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        orig_cam = PinholeCamera.from_intrinsic_matrix(
            sample.K, width=w, height=h
        )
        batched_cams = jax.tree.map(
            np.asarray,
            cam_mod.build_crop_cameras(
                orig_cam,
                jnp.asarray(
                    np.stack([d.box_xyxy for d in kept]), dtype=jnp.float32
                ),
                viewport_size=opts.crop_size,
                viewport_rel_pad=opts.crop_rel_pad,
            ),
        )
        orig_cam = jax.tree.map(np.asarray, orig_cam)
    crop_cams = [
        jax.tree.map(lambda a: a[i], batched_cams) for i in range(len(kept))
    ]
    # Pad the detection count up to a small set of buckets (multiples of 8)
    # so the jitted warp compiles once per bucket instead of once per
    # distinct per-image detection count (each fresh compile on the tunneled
    # chip costs seconds). Padding replicates the last camera/mask; padded
    # outputs are sliced away below.
    n = len(kept)
    n_pad = -(-n // 8) * 8
    padded_cams = crop_cams + [crop_cams[-1]] * (n_pad - n)
    dst_cams = jax.tree.map(lambda *x: jnp.stack(x), *padded_cams)
    mask_list = [
        (d.mask > 0).astype(np.uint8)
        if d.mask is not None
        else np.ones((h, w), np.uint8)
        for d in kept
    ]
    mask_list += [mask_list[-1]] * (n_pad - n)
    masks = jnp.asarray(np.stack(mask_list))
    crop_images, crop_masks = warp_batch(
        jnp.asarray(image), masks, orig_cam, dst_cams
    )
    crop_images = np.asarray(crop_images)[:n]
    crop_masks = np.asarray(crop_masks)[:n]
    prep_time = (time.perf_counter() - t0) / len(kept)

    out = []
    for i, det in enumerate(kept):
        gt = None
        mask_iou = None
        if sample.gt:
            gt_boxes = [g.box_amodal for g in sample.gt if g.obj_id == det.obj_id]
            idx = det_mod.associate_gt_by_iou(det.box_xyxy, gt_boxes)
            matching = [g for g in sample.gt if g.obj_id == det.obj_id]
            if idx >= 0:
                gt = matching[idx]
                if det.mask is not None and gt.mask_visib is not None:
                    m1 = det.mask > 0
                    m2 = gt.mask_visib > 0
                    union = np.logical_or(m1, m2).sum()
                    if union > 0:
                        mask_iou = float(np.logical_and(m1, m2).sum() / union)
        out.append(
            PendingInstance(
                scene_id=sample.scene_id,
                im_id=sample.im_id,
                inst_id=i,
                obj_id=det.obj_id,
                det_score=det.score,
                det_time=det.time,
                orig_camera=orig_cam,
                crop_camera=crop_cams[i],
                crop_image=crop_images[i],
                crop_mask=crop_masks[i],
                gt=gt,
                times={"prep": prep_time},
                mask_iou=mask_iou,
            )
        )
    return out


def _unpack_result(out_np, i: int) -> Dict[str, Any]:
    """One instance's result dict from a fetched batch output (shared by the
    single-object and multi-object batch runners)."""
    return {
        "success": bool(out_np.success[i]),
        "R_m2w": out_np.R_m2w[i],
        "t_m2w": out_np.t_m2w[i],
        "R_m2c": out_np.R_m2c[i],
        "t_m2c": out_np.t_m2c[i],
        "quality": float(out_np.quality[i]),
        "score": float(out_np.score[i]),
        "best_template": int(out_np.best_template[i]),
        "num_queries": float(out_np.num_queries[i]),
        "template_ids": out_np.template_ids[i],
        "corresp_2d": out_np.best_corresp_2d[i],
        "corresp_2d_ids": out_np.best_corresp_2d_ids[i],
        "corresp_3d": out_np.best_corresp_3d[i],
        "corresp_conf": out_np.best_corresp_conf[i],
        "corresp_valid": out_np.best_corresp_valid[i],
    }


class BatchRunner:
    """Streaming dispatcher: keeps up to `max_in_flight` dispatched batches
    un-fetched, so device compute overlaps host-side decode/prep/stacking of
    LATER images (jax dispatch is asynchronous; the serving engine uses the
    same pattern, engine._dispatch_chunks). The synchronous fetch-per-batch
    loop this replaces serialized a full host<->device round trip into every
    batch — at >1600 crops/sec device-side that round trip, not compute,
    bounded CLI throughput. Host memory stays bounded: at most
    (max_in_flight + 1) batches of pendings are alive at once.

    Usage: push(instances) after each image; results() to flush + collect.
    """

    def __init__(self, batch_size: int, dispatch_one, max_in_flight: int = 4):
        self.batch_size = batch_size
        self.dispatch_one = dispatch_one
        self.max_in_flight = max_in_flight
        self._buffer: List[PendingInstance] = []
        self._in_flight: List[Tuple[List[PendingInstance], Any]] = []
        self._results: List[Tuple[PendingInstance, Dict[str, Any]]] = []
        self._seq = 0
        # Wall spent inside dispatch + fetch only (matches the reference's
        # per-stage semantics, scripts/infer.py:636-645): image decode and
        # crop prep are recorded separately as times['prep'], so counting
        # them here again would double-report them in the BOP CSV time sums.
        self._busy_s = 0.0

    def _fetch_oldest(self) -> None:
        import jax

        chunk, out = self._in_flight.pop(0)
        t0 = time.perf_counter()
        out_np = jax.tree.map(np.asarray, out)  # forces execution
        self._busy_s += time.perf_counter() - t0
        for i, p in enumerate(chunk):
            self._results.append((p, _unpack_result(out_np, i)))

    def _dispatch(self, chunk: List[PendingInstance]) -> None:
        padded = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
        t0 = time.perf_counter()
        out = self.dispatch_one(self._seq, padded)
        self._busy_s += time.perf_counter() - t0
        self._in_flight.append((chunk, out))
        self._seq += 1
        while len(self._in_flight) > self.max_in_flight:
            self._fetch_oldest()

    def push(self, instances: List[PendingInstance]) -> None:
        self._buffer.extend(instances)
        while len(self._buffer) >= self.batch_size:
            self._dispatch(self._buffer[: self.batch_size])
            self._buffer = self._buffer[self.batch_size :]

    def results(self) -> List[Tuple[PendingInstance, Dict[str, Any]]]:
        """Flushes the remainder batch + all in-flight work and returns every
        (instance, result) pair pushed so far."""
        if self._buffer:
            self._dispatch(self._buffer)
            self._buffer = []
        while self._in_flight:
            self._fetch_oldest()
        # Per-instance share of the dispatch+fetch wall (per-batch timing is
        # meaningless once dispatch is asynchronous).
        if self._results:
            step_time = self._busy_s / len(self._results)
            for p, _ in self._results:
                p.times["pipeline"] = step_time
        return self._results


def _iter_samples_prefetched(image_keys, load_fn, depth: int = 2):
    """Background-thread sample loader: decodes image i+1..i+depth while the
    main thread preps/dispatches image i. PIL's PNG decode releases the GIL
    for the compressed-data inflate, so even a single-core host overlaps
    some decode with the (also GIL-releasing) device dispatch; on multi-core
    serving hosts the loader thread runs fully in parallel. Exceptions in
    the loader re-raise in the consumer.

    Abandoning the generator (consumer exception, early break, GC) stops the
    worker: the blocking q.put is a bounded-timeout loop on a stop flag, so
    no thread (or the decoded full-resolution images it holds) outlives the
    consumer by more than the timeout."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for im_key in image_keys:
                if not put((im_key, load_fn(*im_key))):
                    return
        except BaseException as e:
            put((sentinel, e))
            return
        put((sentinel, None))

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            im_key, val = q.get()
            if im_key is sentinel:
                if val is not None:
                    raise val
                return
            yield im_key, val
    finally:
        # Runs on normal exhaustion AND on generator close/abandonment
        # (GeneratorExit lands here); the worker exits at its next put.
        stop.set()


def save_visualization(
    p: "PendingInstance",
    r: Dict[str, Any],
    repre,
    renderer,
    obj_id: int,
    out_path: str,
    max_corresp: int = 100,
    inlier_radius: float = 10.0,
) -> None:
    """Saves the per-estimate tile grid (reference: scripts/infer.py:746-802)."""
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.vis import inference_vis

    est_mask = None
    pose_overlay = None
    if renderer is not None:
        est_mask = inference_vis.render_pose_mask(
            renderer, obj_id, p.crop_camera, r["R_m2c"], r["t_m2c"]
        )
        pose_overlay = inference_vis.render_pose_overlay(
            renderer, obj_id, p.crop_camera, r["R_m2c"], r["t_m2c"],
            p.crop_image,
        )

    # Template-side 2D points: project the matched 3D points into the winning
    # template's camera.
    tpl_img = None
    tpl_2d = None
    valid = r["corresp_valid"].astype(bool)
    tid = r["best_template"]
    if repre.templates is not None:
        tpl_img = np.transpose(np.asarray(repre.templates[tid]), (1, 2, 0))
    cam_t = jax.tree_util.tree_map(lambda x: x[tid], repre.template_cameras)
    tpl_2d = np.asarray(
        cam_t.world_to_window(jnp.asarray(r["corresp_3d"]))
    )
    if tpl_img is None:
        tpl_img = np.zeros(
            (p.crop_image.shape[0], p.crop_image.shape[1], 3), dtype=np.uint8
        )

    # Inlier/outlier mask of the shown correspondences under the estimated
    # pose (crop camera; reference: utils/vis_util.py inlier tiles).
    from foundpose_tpu.eval.evaluator import _project_points

    proj = _project_points(
        np.asarray(r["R_m2c"]), np.asarray(r["t_m2c"]),
        np.asarray(r["corresp_3d"], dtype=np.float64),
        np.asarray(p.crop_camera.f, dtype=np.float64),
        np.asarray(p.crop_camera.c, dtype=np.float64),
    )
    dist = np.linalg.norm(proj - np.asarray(r["corresp_2d"]), axis=1)
    inlier_mask = (dist <= inlier_radius)[valid][:max_corresp]

    grid = inference_vis.vis_inference_results(
        p.crop_image,
        p.crop_mask,
        tpl_img,
        r["corresp_2d"][valid][:max_corresp],
        tpl_2d[valid][:max_corresp],
        r["corresp_conf"][valid][:max_corresp],
        est_mask=est_mask,
        caption=f"s{p.scene_id} im{p.im_id} q={r['quality']:.0f} "
        f"score={r['score']:.2f}",
        max_corresp=max_corresp,
        inlier_mask=inlier_mask,
        pose_overlay=pose_overlay,
    )
    from PIL import Image

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    Image.fromarray(grid).save(out_path)


def finalize_object_results(
    opts: InferOpts,
    lid: int,
    results: List[Tuple[PendingInstance, Dict[str, Any]]],
    repre,
    model,
    evaluator: EvaluatorPose,
    pts: np.ndarray,
    sym_r: np.ndarray,
    sym_t: np.ndarray,
    diameter: Optional[float],
) -> None:
    """Visualization, evaluator accumulation, and output files for ONE object.

    Shared tail of the single-object and multi-object drivers so the two
    paths cannot drift: tile grids + error PLYs + histograms (reference:
    scripts/infer.py:746-802), evaluator accumulation including the
    retrieved-template orientation error (reference:
    utils/eval_util.py:175-188), estimated-poses.json + metric tables +
    HTML gallery (reference: scripts/infer.py:813-816,
    utils/eval_util.py:400-590).
    """
    # Resolved once for every run-level output below (poses/metrics/config/
    # gallery AND the score histogram): per-instance vis tiles are keyed by
    # (scene, image, instance) and shards hold disjoint images, but run-level
    # files need the shard suffix or concurrent shards would clobber them.
    si, sc = host_shard.shard_of(opts)
    sname = lambda base: host_shard.sharded_name(base, si, sc)

    renderer = None
    vis_images = []
    if opts.vis_results:
        from foundpose_tpu.renderer.base import RendererType, build as build_renderer

        renderer = build_renderer(RendererType.SOFTWARE_RASTERIZER)
        renderer.add_object_model(lid, model)
        vis_dir = os.path.join(
            opts.output_dir, opts.object_dataset, opts.version, str(lid), "vis"
        )
        # Created up front: score_hist.png below writes here even when no
        # per-instance tile grid was saved (e.g. every results[:vis_count]
        # instance failed but a later one succeeded).
        os.makedirs(vis_dir, exist_ok=True)
        for vi, (p, r) in enumerate(results[: opts.vis_count]):
            if not r["success"]:
                continue
            path = os.path.join(
                vis_dir, f"s{p.scene_id}_im{p.im_id}_i{p.inst_id}.png"
            )
            save_visualization(
                p, r, repre, renderer, lid, path,
                max_corresp=opts.vis_corresp_top_n,
                inlier_radius=opts.pnp_inlier_thresh,
            )
            vis_images.append((r, path))
            if p.gt is not None:
                # GT-vs-estimate vertex point cloud for 3D inspection
                # (reference: utils/vis_util.py:78-124), in the original
                # camera frame (where gt poses live).
                from foundpose_tpu.vis.inference_vis import vis_pointcloud_error

                t_w2oc = np.linalg.inv(
                    np.asarray(p.orig_camera.T_world_from_eye)
                )
                m2w = np.eye(4)
                m2w[:3, :3] = np.asarray(r["R_m2w"])
                m2w[:3, 3] = np.asarray(r["t_m2w"]).flatten()
                m2oc = t_w2oc @ m2w
                vis_pointcloud_error(
                    pts, m2oc[:3, :3], m2oc[:3, 3],
                    p.gt.R_m2c, p.gt.t_m2c,
                    os.path.join(
                        vis_dir,
                        f"s{p.scene_id}_im{p.im_id}_i{p.inst_id}_error.ply",
                    ),
                )
        # Run-level score/error histograms (reference plot primitives,
        # utils/vis_base_util.py:46-437).
        from PIL import Image as _Image

        from foundpose_tpu.vis.base import draw_histogram

        scores = [r["score"] for _, r in results if r["success"]]
        if scores:
            _Image.fromarray(
                draw_histogram(np.asarray(scores), title="score")
            ).save(os.path.join(vis_dir, sname("score_hist.png")))

    cam_t_np = np.asarray(repre.template_cameras.T_world_from_eye)
    for p, r in results:
        if not r["success"]:
            continue
        # Orientations (model->camera) of all retrieved templates, for the
        # template-orientation-error accumulator
        # (reference: utils/eval_util.py:175-188).
        tpl_r_m2c = None
        if p.gt is not None:
            tids = np.asarray(r["template_ids"], dtype=int).reshape(-1)
            # Mesh runs retrieve against a PADDED bank (repre.pad_templates);
            # pad rows score -inf and never win, but their ids can appear in
            # the retrieved top-n — drop them before indexing the unpadded
            # repre's cameras.
            tids = tids[(tids >= 0) & (tids < cam_t_np.shape[0])]
            if tids.size:
                tpl_r_m2c = np.stack(
                    [np.linalg.inv(cam_t_np[tid])[:3, :3] for tid in tids]
                )
        evaluator.update(
            scene_id=p.scene_id, im_id=p.im_id, inst_id=p.inst_id,
            hypothesis_id=0, obj_id=p.obj_id,
            R_m2w=r["R_m2w"], t_m2w=r["t_m2w"],
            orig_camera_c2w=p.orig_camera,
            score=r["score"],
            time_per_inst=p.times,
            R_gt_m2c=p.gt.R_m2c if p.gt else None,
            t_gt_m2c=p.gt.t_m2c if p.gt else None,
            model_pts=pts if p.gt else None,
            sym_r=sym_r if p.gt else None,
            sym_t=sym_t if p.gt else None,
            K=np.asarray(p.orig_camera.K) if p.gt else None,
            camera_c2w=p.crop_camera,
            corresp={
                "coord_2d": r["corresp_2d"],
                "coord_2d_ids": r["corresp_2d_ids"],
                "coord_3d": r["corresp_3d"],
                "valid": r["corresp_valid"],
            },
            object_diameter=diameter,
            retrieved_template_R_m2c=tpl_r_m2c,
            mask_iou=p.mask_iou,
            inlier_radius=opts.pnp_inlier_thresh,
        )

    if opts.save_estimates:
        out_dir = os.path.join(
            opts.output_dir, opts.object_dataset, opts.version, str(lid)
        )
        os.makedirs(out_dir, exist_ok=True)
        name = lambda base: os.path.join(out_dir, sname(base))
        config_util.save_opts(opts, name("config.json"))
        evaluator.save_results_json(name("estimated-poses.json"))
        evaluator.save_metrics_tsv(name("metrics.tsv"))
        # Reference-layout per-object metric table
        # (reference: utils/eval_util.py:400-516).
        evaluator.save_metrics(
            name("metrics-table.tsv"),
            inlier_thresh=opts.pnp_inlier_thresh,
        )
        # Best/worst gallery over the visualized estimates
        # (reference: utils/eval_util.py:518-590).
        if vis_images:
            from PIL import Image as PILImage

            from foundpose_tpu.vis.html_report import write_gallery

            recs, imgs = [], []
            for r, path in vis_images:
                recs.append({"score": r["score"], "quality": r["quality"]})
                imgs.append(np.asarray(PILImage.open(path)))
            write_gallery(
                name("report.html"), recs, imgs,
                metric_key="score", top_n=min(10, len(recs)),
            )
    logger.info(f"Summary for object {lid}: {evaluator.summary()}")


def _build_mesh(opts: InferOpts):
    """Builds the chip mesh for opts.mesh_shape and validates the batch."""
    from foundpose_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(shape=tuple(opts.mesh_shape))
    data = mesh.shape[mesh_mod.DATA_AXIS]
    if opts.batch_size % data:
        raise ValueError(
            f"the data axis ({data}) of mesh_shape={opts.mesh_shape} must "
            f"divide batch_size={opts.batch_size}"
        )
    logger.info(f"Multi-chip mesh: {dict(mesh.shape)}")
    return mesh


def _make_mesh_object_step(mesh, vit_cfg, config, repre, vit_params):
    """Shards one object's repre on the mesh and returns
    (step(params, crops, masks, cams, key), placed params). With a `model`
    axis the ViT weights are factored + split tensor-parallel. Single-sourced
    with the serving engine in parallel/sharded_inference."""
    from foundpose_tpu.parallel.sharded_inference import (
        make_object_mesh_step,
        prepare_mesh_vit_params,
    )

    step = make_object_mesh_step(mesh, vit_cfg, config, repre)
    return step, prepare_mesh_vit_params(mesh, vit_cfg, vit_params)


def infer(opts: InferOpts) -> Dict[int, int]:
    """Runs inference; returns {object_lid: instances processed} (estimates
    written to disk may be fewer — only successful solves are serialized,
    reference: scripts/infer.py:813-816)."""
    import jax
    import jax.numpy as jnp_mod

    vit_cfg = dinov2.resolve_config(
        opts.extractor_name,
        use_pallas_attention=opts.use_pallas_attention,
        use_fused_block=opts.use_fused_block,
        approx_gelu=opts.approx_gelu,
        overrides=opts.vit_overrides,
    )
    if opts.weights_path:
        vit_params = weights_mod.load_checkpoint(opts.weights_path, vit_cfg)
    else:
        logger.warning("No DINOv2 weights_path given; using random init.")
        vit_params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)

    config = inference.InferenceConfig(
        crop_size=opts.crop_size,
        grid_cell_size=opts.grid_cell_size,
        max_num_queries=opts.max_num_queries,
        top_n_templates=opts.match_top_n_templates,
        top_k_buddies=opts.match_top_k_buddies,
        approx_topk=opts.approx_topk,
        pnp_ransac_iter=opts.pnp_ransac_iter,
        pnp_select_iter=opts.pnp_select_iter,
        pnp_inlier_thresh=opts.pnp_inlier_thresh,
        pnp_refine_lm=opts.pnp_refine_lm,
        pnp_lo_iters=opts.pnp_lo_iters,
        refine_featuremetric=opts.refine_featuremetric,
        compute_dtype=getattr(jnp_mod, opts.compute_dtype),
    )
    mesh = _build_mesh(opts) if opts.mesh_shape else None
    step = None if mesh is not None else inference.jit_pose_from_crops(
        vit_cfg, config
    )
    warp_batch = make_warp_fn(opts.crop_size)

    all_dets = (
        det_mod.load_detections(opts.detections_path) if opts.use_detections else {}
    )
    models_info = bop.load_models_info(opts.bop_root, opts.object_dataset)
    object_lids = opts.object_lids or bop.OBJECT_IDS.get(opts.object_dataset, [])

    # Host-level dataset sharding: this process handles image_keys[si::sc]
    # and its resume/output files carry the shard suffix.
    si, sc = host_shard.shard_of(opts)
    if sc > 1:
        logger.info(f"Dataset shard {si}/{sc} (host-level round-robin).")

    counts: Dict[int, int] = {}
    for lid in object_lids:
        log_heading(logger, f"Inference for object {lid} of {opts.object_dataset}")
        out_json = os.path.join(
            opts.output_dir, opts.object_dataset, opts.version, str(lid),
            host_shard.sharded_name("estimated-poses.json", si, sc),
        )
        if opts.resume and os.path.exists(out_json):
            logger.info(f"Resume: results exist for object {lid}, skipping.")
            continue
        repre = load_repre(
            os.path.join(opts.repre_dir, opts.object_dataset, opts.repre_version, str(lid))
        )
        if opts.compute_dtype != "float32":
            repre = repre.cast_banks(getattr(jnp_mod, opts.compute_dtype))
        evaluator = EvaluatorPose([lid])
        model = bop.load_object_model(opts.bop_root, opts.object_dataset, lid)
        info = models_info.get(lid, {})
        syms = bop.get_symmetry_transformations(info, opts.max_sym_disc_step)
        sym_r = np.stack([s["R"] for s in syms]).astype(np.float32)
        sym_t = np.stack([np.asarray(s["t"]).flatten() for s in syms]).astype(np.float32)
        # Subsampled model points for error metrics.
        pts = model.vertices
        if len(pts) > 1000:
            pts = pts[np.linspace(0, len(pts) - 1, 1000).astype(int)]

        # Gather (scene, image) pairs: from detections, or from GT annotations
        # when use_detections=False (reference: infer_pose_util.py:140-149).
        if mesh is not None:
            from foundpose_tpu.parallel.mesh import crop_sharding

            mesh_step, mesh_params = _make_mesh_object_step(
                mesh, vit_cfg, config, repre, vit_params
            )
            crop_shd = crop_sharding(mesh)

            def dispatch_one(s, padded, _step=mesh_step, _params=mesh_params):
                crops = jax.device_put(
                    np.stack([p.crop_image for p in padded]), crop_shd
                )
                masks = jax.device_put(
                    np.stack([p.crop_mask for p in padded]), crop_shd
                )
                cams = jax.tree.map(
                    lambda *x: jnp_mod.stack(x), *[p.crop_camera for p in padded]
                )
                return _step(_params, crops, masks, cams, jax.random.PRNGKey(s))
        else:
            def dispatch_one(s, padded, _repre=repre):
                crops = jnp_mod.asarray(np.stack([p.crop_image for p in padded]))
                masks = jnp_mod.asarray(np.stack([p.crop_mask for p in padded]))
                cams = jax.tree.map(
                    lambda *x: jnp_mod.stack(x), *[p.crop_camera for p in padded]
                )
                return step(
                    vit_params, crops, masks, cams, _repre, jax.random.PRNGKey(s)
                )

        runner = BatchRunner(opts.batch_size, dispatch_one)
        if opts.use_detections:
            keys = sorted(k for k in all_dets if k[2] == lid)
            image_keys = [(s, i) for s, i, _ in keys]
        else:
            image_keys = []
            for scene_id in bop.list_scenes(opts.bop_root, opts.object_dataset):
                for im_id in bop.list_images(opts.bop_root, opts.object_dataset, scene_id):
                    image_keys.append((scene_id, im_id))
        # Both branches build the same ordered list on every host, so the
        # round-robin shard is consistent across processes.
        image_keys = host_shard.shard_keys(image_keys, si, sc)
        def load_sample(scene_id, im_id):
            return bop.prepare_sample(
                opts.bop_root, opts.object_dataset, scene_id, im_id,
                load_gt=True, load_masks=not opts.use_detections,
                crop_size=opts.dataset_crop_size,
            )

        for (scene_id, im_id), sample in _iter_samples_prefetched(
            image_keys, load_sample
        ):
            if opts.use_detections:
                gt_count = sum(1 for g in sample.gt if g.obj_id == lid)
                max_preds = max(1, int(opts.num_preds_factor * max(gt_count, 1)))
                instances = det_mod.instances_for_pose_estimation(
                    all_dets[(scene_id, im_id, lid)],
                    max_num_preds=max_preds,
                    crop_offset=sample.crop_offset,
                    image_size=(sample.image.shape[1], sample.image.shape[0]),
                )
                for det in instances:
                    evaluator.detection_times[(scene_id, im_id)] = det.time
            else:
                instances = []
                for g in sample.gt:
                    if g.obj_id != lid or g.visib_fract < opts.min_visibility:
                        continue
                    if g.box_amodal is None:
                        continue
                    instances.append(
                        det_mod.Detection(
                            scene_id=scene_id, im_id=im_id, obj_id=lid,
                            score=1.0, box_xyxy=np.asarray(g.box_amodal),
                            mask=g.mask_visib, time=0.0,
                        )
                    )
                evaluator.detection_times[(scene_id, im_id)] = 0.0
            # Stream batches to the device as they fill (host memory stays
            # bounded by a few batches of crops) WITHOUT fetching results
            # until several more batches are dispatched — the runner overlaps
            # device compute with the next images' decode/prep.
            runner.push(prepare_instance_crops(sample, instances, opts, warp_batch))

        results = runner.results()
        logger.info(f"{len(results)} instances processed for object {lid}")
        counts[lid] = len(results)
        if not results:
            # Unsharded: write nothing (an empty estimated-poses.json would
            # make resume=True treat a failed object as completed). Sharded:
            # an empty shard is a legitimate outcome (its images fell on the
            # other shards) — mark it done via the host_shard sentinel so
            # load_object_estimates can verify shard-set completeness.
            if sc > 1 and opts.save_estimates:
                host_shard.write_empty_shard_sentinel(
                    os.path.dirname(out_json), si, sc
                )
            continue

        diameter = float(info["diameter"]) if "diameter" in info else None
        finalize_object_results(
            opts, lid, results, repre, model, evaluator, pts, sym_r, sym_t,
            diameter,
        )
    return counts


def main() -> None:
    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    opts = config_util.load_opts(InferOpts)
    if opts.multi_object:
        infer_multi_object(opts)
    else:
        infer(opts)


if __name__ == "__main__":
    main()


def infer_multi_object(opts: InferOpts) -> Dict[int, int]:
    """Mixed-object inference: all objects share batches through one stacked
    multi-object repre (pipeline/multi_object.py). One pass over the test
    images instead of the reference's per-object loop."""
    import jax

    import jax.numpy as jnp_mod

    from foundpose_tpu.pipeline import multi_object as mo
    from foundpose_tpu.repre import stack_repres

    vit_cfg = dinov2.resolve_config(
        opts.extractor_name,
        use_pallas_attention=opts.use_pallas_attention,
        use_fused_block=opts.use_fused_block,
        approx_gelu=opts.approx_gelu,
        overrides=opts.vit_overrides,
    )
    if opts.weights_path:
        vit_params = weights_mod.load_checkpoint(opts.weights_path, vit_cfg)
    else:
        logger.warning("No DINOv2 weights_path given; using random init.")
        vit_params = dinov2.init_params(jax.random.PRNGKey(0), vit_cfg)

    config = inference.InferenceConfig(
        crop_size=opts.crop_size,
        grid_cell_size=opts.grid_cell_size,
        max_num_queries=opts.max_num_queries,
        top_n_templates=opts.match_top_n_templates,
        top_k_buddies=opts.match_top_k_buddies,
        approx_topk=opts.approx_topk,
        pnp_ransac_iter=opts.pnp_ransac_iter,
        pnp_select_iter=opts.pnp_select_iter,
        pnp_inlier_thresh=opts.pnp_inlier_thresh,
        pnp_refine_lm=opts.pnp_refine_lm,
        pnp_lo_iters=opts.pnp_lo_iters,
        refine_featuremetric=opts.refine_featuremetric,
        compute_dtype=getattr(jnp_mod, opts.compute_dtype),
    )
    mesh = _build_mesh(opts) if opts.mesh_shape else None
    step = None if mesh is not None else mo.jit_pose_from_crops_multi(
        vit_cfg, config
    )
    warp_batch = make_warp_fn(opts.crop_size)

    all_dets = (
        det_mod.load_detections(opts.detections_path) if opts.use_detections else {}
    )
    models_info = bop.load_models_info(opts.bop_root, opts.object_dataset)
    object_lids = opts.object_lids or bop.OBJECT_IDS.get(opts.object_dataset, [])

    repres = {
        lid: load_repre(
            os.path.join(opts.repre_dir, opts.object_dataset, opts.repre_version,
                         str(lid))
        )
        for lid in object_lids
    }
    multi_repre = stack_repres([repres[lid] for lid in object_lids])
    if opts.compute_dtype != "float32":
        multi_repre = multi_repre.cast_banks(getattr(jnp_mod, opts.compute_dtype))
    obj_to_idx = {lid: i for i, lid in enumerate(object_lids)}
    evaluators = {lid: EvaluatorPose([lid]) for lid in object_lids}

    obj_meta = {}
    for lid in object_lids:
        model = bop.load_object_model(opts.bop_root, opts.object_dataset, lid)
        info = models_info.get(lid, {})
        syms = bop.get_symmetry_transformations(info, opts.max_sym_disc_step)
        pts = model.vertices
        if len(pts) > 1000:
            pts = pts[np.linspace(0, len(pts) - 1, 1000).astype(int)]
        obj_meta[lid] = (
            pts,
            np.stack([s["R"] for s in syms]).astype(np.float32),
            np.stack([np.asarray(s["t"]).flatten() for s in syms]).astype(np.float32),
            model,
        )

    # (scene, image) pairs: from detections, or every test image when
    # use_detections=False — the same GT-fallback the single-object path has
    # (reference: infer_pose_util.py:140-149).
    if opts.use_detections:
        image_keys = sorted({(s, i) for (s, i, c) in all_dets if c in obj_to_idx})
    else:
        image_keys = [
            (s, i)
            for s in bop.list_scenes(opts.bop_root, opts.object_dataset)
            for i in bop.list_images(opts.bop_root, opts.object_dataset, s)
        ]
    # Host-level dataset sharding (same ordered list on every host).
    si, sc = host_shard.shard_of(opts)
    if sc > 1:
        logger.info(f"Dataset shard {si}/{sc} (host-level round-robin).")
    image_keys = host_shard.shard_keys(image_keys, si, sc)
    if mesh is not None:
        from foundpose_tpu.parallel import mesh as mesh_mod
        from foundpose_tpu.parallel.sharded_inference import (
            make_multi_object_mesh_step,
            prepare_mesh_vit_params,
        )

        mesh_step, _ = make_multi_object_mesh_step(
            mesh, vit_cfg, config, multi_repre
        )
        # Factored + model-split on a 3-axis (tensor-parallel) mesh,
        # unchanged on a (data, bank) mesh.
        vit_params = prepare_mesh_vit_params(mesh, vit_cfg, vit_params)
        crop_shd = mesh_mod.crop_sharding(mesh)

        def dispatch_one(s, padded):
            crops = jax.device_put(
                np.stack([p.crop_image for p in padded]), crop_shd
            )
            masks = jax.device_put(
                np.stack([p.crop_mask for p in padded]), crop_shd
            )
            cams = jax.tree.map(
                lambda *x: jnp_mod.stack(x), *[p.crop_camera for p in padded]
            )
            obj_idx = jax.device_put(
                np.asarray(
                    [obj_to_idx[p.obj_id] for p in padded], dtype=np.int32
                ),
                crop_shd,
            )
            return mesh_step(
                vit_params, crops, masks, cams, obj_idx, jax.random.PRNGKey(s)
            )
    else:
        def dispatch_one(s, padded):
            crops = jnp_mod.asarray(np.stack([p.crop_image for p in padded]))
            masks = jnp_mod.asarray(np.stack([p.crop_mask for p in padded]))
            cams = jax.tree.map(
                lambda *x: jnp_mod.stack(x), *[p.crop_camera for p in padded]
            )
            obj_idx = jnp_mod.asarray(
                [obj_to_idx[p.obj_id] for p in padded], dtype=jnp_mod.int32
            )
            return step(
                vit_params, crops, masks, cams, obj_idx, multi_repre,
                jax.random.PRNGKey(s),
            )

    runner = BatchRunner(opts.batch_size, dispatch_one)

    def load_sample(scene_id, im_id):
        return bop.prepare_sample(
            opts.bop_root, opts.object_dataset, scene_id, im_id, load_gt=True,
            load_masks=not opts.use_detections,
            crop_size=opts.dataset_crop_size,
        )

    for (scene_id, im_id), sample in _iter_samples_prefetched(
        image_keys, load_sample
    ):
        for lid in object_lids:
            if opts.use_detections:
                dets = all_dets.get((scene_id, im_id, lid))
                if not dets:
                    continue
                gt_count = sum(1 for g in sample.gt if g.obj_id == lid)
                max_preds = max(1, int(opts.num_preds_factor * max(gt_count, 1)))
                instances = det_mod.instances_for_pose_estimation(
                    dets, max_num_preds=max_preds, crop_offset=sample.crop_offset,
                    image_size=(sample.image.shape[1], sample.image.shape[0]),
                )
                for det in instances:
                    evaluators[lid].detection_times[(scene_id, im_id)] = det.time
            else:
                instances = []
                for g in sample.gt:
                    if g.obj_id != lid or g.visib_fract < opts.min_visibility:
                        continue
                    if g.box_amodal is None:
                        continue
                    instances.append(
                        det_mod.Detection(
                            scene_id=scene_id, im_id=im_id, obj_id=lid,
                            score=1.0, box_xyxy=np.asarray(g.box_amodal),
                            mask=g.mask_visib, time=0.0,
                        )
                    )
                if not instances:
                    continue
                evaluators[lid].detection_times[(scene_id, im_id)] = 0.0
            runner.push(prepare_instance_crops(sample, instances, opts, warp_batch))
    results = runner.results()
    logger.info(f"{len(results)} instances processed over {len(object_lids)} objects")

    # Shared per-object tail (vis + evaluator incl. retrieved-template
    # orientations + outputs) — identical to the single-object driver's.
    results_by_lid: Dict[int, List[Tuple[PendingInstance, Dict[str, Any]]]] = {
        lid: [] for lid in object_lids
    }
    for p, r in results:
        results_by_lid[p.obj_id].append((p, r))
    for lid in object_lids:
        # Match the single-object driver: objects with no processed instances
        # write nothing when unsharded (an empty estimated-poses.json would
        # otherwise make a later resume=True run treat the object as
        # completed); a SHARD with no instances is marked done via the
        # host_shard sentinel so the submission merger can verify the shard
        # set is complete.
        if not results_by_lid[lid]:
            if sc > 1 and opts.save_estimates:
                host_shard.write_empty_shard_sentinel(
                    os.path.join(
                        opts.output_dir, opts.object_dataset, opts.version,
                        str(lid),
                    ),
                    si, sc,
                )
            continue
        pts, sym_r, sym_t, model = obj_meta[lid]
        info = models_info.get(lid, {})
        diameter = float(info["diameter"]) if "diameter" in info else None
        finalize_object_results(
            opts, lid, results_by_lid[lid], repres[lid], model,
            evaluators[lid], pts, sym_r, sym_t, diameter,
        )
    return {lid: len(results_by_lid[lid]) for lid in object_lids}
