"""Template synthesis: viewsphere sampling + native rasterization + crops.

Re-design of the reference template generator
(reference: scripts/gen_templates.py:70-492). Key difference: instead of
rendering at the base camera and warping into the virtual crop camera
(reference :266-344), the object's 2D box is computed analytically from the
projected mesh vertices and the template is rendered *directly through the
crop camera* at SSAA resolution — sharper templates, no resampling pass.

Output artifacts (PNG rgb/depth/mask + metadata.json) use the reference's
exact metadata schema (reference :439-480), so templates are interchangeable
between the two implementations in both directions.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from foundpose_tpu import cameras as cam_mod
from foundpose_tpu.data import bop
from foundpose_tpu.parallel import host_shard
from foundpose_tpu.data.ply import Mesh
from foundpose_tpu.renderer.base import RendererType, RenderType, build
from foundpose_tpu.structs import PinholeCamera
from foundpose_tpu.utils import config as config_util
from foundpose_tpu.utils.logging_util import Timer, get_logger, log_heading

logger = get_logger()


@dataclasses.dataclass(frozen=True)
class GenTemplatesOpts:
    """(reference: scripts/gen_templates.py:35-67)"""

    version: str = "v1"
    object_dataset: str = "lmo"
    object_lids: Optional[List[int]] = None

    num_viewspheres: int = 1
    min_num_viewpoints: int = 57
    num_inplane_rotations: int = 14
    depth_range: Optional[Tuple[float, float]] = None  # mm; None -> from diameter
    # Renders per view (reference: scripts/gen_templates.py:46,241 — its
    # loop repeats each view this many times). With this deterministic
    # rasterizer the repeats are identical images; honored for template-set
    # shape parity with reference-built configs.
    images_per_view: int = 1
    # Schema parity with the reference's opts (scripts/gen_templates.py:
    # 49-51); like `background_type`/`light_type` below, the reference
    # declares but never consumes these three anywhere in its code.
    max_num_triangles: int = 20000
    back_face_culling: bool = False
    texture_size: Tuple[int, int] = (1024, 1024)

    ssaa_factor: float = 4.0
    # Schema parity with the reference; like there, these two are accepted
    # but not consumed (the reference's pyrender path hardcodes its own
    # camera spotlight + black background, reference gen_templates.py:55-56,
    # renderer.py:244-266; our rasterizer's headlight approximates it).
    background_type: str = "black"
    light_type: str = "multi_directional"

    features_patch_size: int = 14
    crop: bool = True
    crop_rel_pad: float = 0.2
    crop_size: Tuple[int, int] = (420, 420)

    # Render/encode worker threads (0 = os.cpu_count()). The native
    # rasterizer and cv2's resize/imencode all release the GIL and use
    # per-call buffers, so views render and write in parallel on multi-core
    # hosts; template numbering stays deterministic (results are consumed
    # in view order).
    render_threads: int = 0

    overwrite: bool = False
    # Skip objects whose metadata.json already exists (stage-level resume;
    # overwrite=False still raises on partial/unknown existing dirs).
    resume: bool = False
    # Multi-host sharding: the offline stages shard by OBJECT (each object's
    # artifacts live in their own dir, so no filename suffixing is needed).
    # shard_count=0 auto-resolves from the JAX distributed runtime.
    shard_index: int = 0
    shard_count: int = 1

    # Paths (bop_root + output_dir replace the reference's env-var roots).
    bop_root: str = ""
    output_dir: str = ""


def _camera_json(cam: PinholeCamera) -> dict:
    """Camera -> reference to_json schema (reference: utils/structs.py:357-371)."""
    t = np.asarray(cam.T_world_from_eye, dtype=np.float64)
    return {
        "ImageSizeX": cam.width,
        "ImageSizeY": cam.height,
        "T_WorldFromCamera": t.tolist(),
        "ModelViewMatrix": np.linalg.inv(t).tolist(),
        "fx": float(cam.f[0]),
        "fy": float(cam.f[1]),
        "cx": float(cam.c[0]),
        "cy": float(cam.c[1]),
    }


def camera_from_json(data: dict) -> PinholeCamera:
    # Host-side IO: the pytree is built with NUMPY leaves on purpose.
    # PinholeCamera.create's eager jnp ops each dispatch to the default
    # device, and on a tunneled accelerator that is a ~100 ms round trip
    # per call — loading one object's 798 template cameras through it
    # profiled at ~2 minutes of pure dispatch overhead.
    t = np.asarray(data["T_WorldFromCamera"], dtype=np.float32)
    if t.shape == (3, 4):
        t = np.concatenate([t, np.asarray([[0.0, 0.0, 0.0, 1.0]], t.dtype)])
    return PinholeCamera(
        f=np.asarray([data["fx"], data["fy"]], dtype=np.float32),
        c=np.asarray([data["cx"], data["cy"]], dtype=np.float32),
        T_world_from_eye=t,
        width=int(data["ImageSizeX"]),
        height=int(data["ImageSizeY"]),
    )


def save_depth_png(path: str, depth: np.ndarray) -> None:
    """16-bit PNG depth in 0.1mm units (BOP convention)."""
    d = np.clip(np.round(depth * 10.0), 0, 65535).astype(np.uint16)
    Image.fromarray(d).save(path)


def load_depth_png(path: str) -> np.ndarray:
    return np.asarray(Image.open(path)).astype(np.float32) / 10.0


def synthesize_templates_for_object(
    mesh: Mesh,
    model_info: dict,
    opts: GenTemplatesOpts,
    object_lid: int,
    output_dir: str,
) -> List[dict]:
    """Renders the template set for one object; returns the metadata list."""
    os.makedirs(os.path.join(output_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "depth"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "mask"), exist_ok=True)

    # Viewsphere radii: from the test depth range when provided, else from the
    # model diameter (reference derives it from the test targets' depth
    # distribution, scripts/gen_templates.py:147-154).
    if opts.depth_range is not None:
        radii = cam_mod.view_sphere_radii(opts.depth_range, opts.num_viewspheres)
    else:
        diameter = float(model_info.get("diameter", 200.0))
        radii = cam_mod.view_sphere_radii(
            (4.0 * diameter, 8.0 * diameter), opts.num_viewspheres
        )

    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(object_lid, mesh)

    # Base camera used only for the analytic 2D box (its intrinsics are
    # arbitrary; the crop-camera construction normalizes scale).
    base_w, base_h = 640, 480
    base_f = (572.4, 573.6)
    base_c = (base_w / 2 - 0.5, base_h / 2 - 0.5)

    ssaa = float(opts.ssaa_factor)
    crop_w, crop_h = opts.crop_size
    hi_w, hi_h = int(crop_w * ssaa), int(crop_h * ssaa)

    metadata_list: List[dict] = []
    template_counter = 0
    timer = Timer(logger=logger)

    # Collect every view up front so the crop-camera math runs ONCE,
    # batched over all ~800 views: the per-view eager-jnp version cost two
    # CPU-jit dispatches per template (~0.1 s of the 0.21 s/template wall);
    # one vectorized call over the view axis is milliseconds total.
    all_views: List[dict] = []
    for radius in radii:
        views = cam_mod.sample_views(opts.min_num_viewpoints, radius=radius)
        all_views.extend(
            cam_mod.inplane_rotated_views(views, opts.num_inplane_rotations)
        )
    if opts.images_per_view > 1:
        # Reference semantics: each view rendered images_per_view times
        # (scripts/gen_templates.py:241).
        all_views = [v for v in all_views for _ in range(opts.images_per_view)]
    num_views = len(all_views)
    rs = np.stack([v["R"] for v in all_views]).astype(np.float64)  # [N,3,3]
    ts = np.stack([np.reshape(v["t"], 3) for v in all_views]).astype(np.float64)

    # Analytic object boxes in the base camera, all views at once. The
    # [N, V, 3] intermediate is chunked so high-poly meshes (BOP models run
    # up to ~300k vertices) stay within a few hundred MB of host memory.
    boxes = np.empty((num_views, 4), dtype=np.float32)
    vchunk = max(1, int(2e7) // max(len(mesh.vertices), 1))
    for s in range(0, num_views, vchunk):
        e = min(s + vchunk, num_views)
        vc = np.einsum("nij,vj->nvi", rs[s:e], mesh.vertices) + ts[s:e, None, :]
        proj_c = vc[:, :, :2] / vc[:, :, 2:3] * np.asarray(base_f) + base_c
        boxes[s:e, 0] = proj_c[:, :, 0].min(axis=1)
        boxes[s:e, 1] = proj_c[:, :, 1].min(axis=1)
        boxes[s:e, 2] = proj_c[:, :, 0].max(axis=1)
        boxes[s:e, 3] = proj_c[:, :, 1].max(axis=1)

    # Camera->world (model frame) per view: inv([R|t]) = [R^T | -R^T t].
    t_c2w_all = np.zeros((num_views, 4, 4), dtype=np.float32)
    t_c2w_all[:, :3, :3] = np.transpose(rs, (0, 2, 1))
    t_c2w_all[:, :3, 3] = -np.einsum("nji,nj->ni", rs, ts)
    t_c2w_all[:, 3, 3] = 1.0

    import jax
    import jax.numpy as jnp

    # One batched crop-camera construction on the CPU backend (the batch
    # dims ride calc_crop_box/construct_crop_camera's leading `...` axes,
    # same as the online path's cameras.build_crop_cameras).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        base_cams = PinholeCamera(
            f=jnp.broadcast_to(jnp.asarray(base_f, jnp.float32), (num_views, 2)),
            c=jnp.broadcast_to(jnp.asarray(base_c, jnp.float32), (num_views, 2)),
            T_world_from_eye=jnp.asarray(t_c2w_all),
            width=base_w,
            height=base_h,
        )
        crop_boxes = cam_mod.calc_crop_box(jnp.asarray(boxes), make_square=True)
        crop_cams = cam_mod.construct_crop_camera(
            box=crop_boxes,
            camera_c2w=base_cams,
            viewport_size=(crop_w, crop_h),
            viewport_rel_pad=opts.crop_rel_pad,
        )
        crop_cams = jax.tree.map(np.asarray, crop_cams)

    # Threaded render + encode pipeline (round 5): rendering (native C++
    # via ctypes), SSAA resize and PNG encode (cv2) all release the GIL
    # and keep per-call state, so views run on a worker pool, bounded to
    # 2x workers in flight (a full executor.map would hold ~2 GB of
    # rendered frames). Results are consumed IN VIEW ORDER so template
    # numbering/metadata are byte-identical to the sequential loop; PNG
    # writes are submitted to an IO pool and joined at the end. On this
    # 1-core bench host the pool measures neutral; on the 8-core
    # production host the baseline grants the reference (BASELINE.md
    # §offline) the render/encode stages scale with cores.
    import cv2
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def render_view(view_idx):
        crop_cam = PinholeCamera(
            f=crop_cams.f[view_idx],
            c=crop_cams.c[view_idx],
            T_world_from_eye=crop_cams.T_world_from_eye[view_idx],
            width=crop_w,
            height=crop_h,
        )
        # Render directly through the crop camera at SSAA resolution.
        hi_cam = PinholeCamera(
            f=crop_cam.f * ssaa,
            c=(crop_cam.c + 0.5) * ssaa - 0.5,
            T_world_from_eye=crop_cam.T_world_from_eye,
            width=hi_w,
            height=hi_h,
        )
        out = renderer.render_object_model(object_lid, hi_cam)
        color_hi = np.asarray(out[RenderType.COLOR])
        depth_hi = np.asarray(out[RenderType.DEPTH])
        mask_hi = np.asarray(out[RenderType.MASK])

        if mask_hi.sum() == 0:
            return None

        # SSAA downsample: area for color, nearest for depth/mask
        # (reference: scripts/gen_templates.py:372-385).
        color = cv2.resize(color_hi, (crop_w, crop_h), interpolation=cv2.INTER_AREA)
        depth = cv2.resize(depth_hi, (crop_w, crop_h), interpolation=cv2.INTER_NEAREST)
        mask = cv2.resize(mask_hi, (crop_w, crop_h), interpolation=cv2.INTER_NEAREST)
        return crop_cam, color, depth, mask

    import threading

    n_workers = opts.render_threads or (os.cpu_count() or 1)
    # Writes are bounded too: without the semaphore the io_pool's internal
    # queue would buffer every downsampled frame (~3.5 MB each) whenever
    # encode/disk is slower than rendering — acquiring a slot in the main
    # loop backpressures rendering as well.
    write_slots = threading.Semaphore(2 * n_workers)

    def write_template(rgb_path, depth_path, mask_path, color, depth, mask):
        # cv2's PNG encoder at its default level is ~5x faster than
        # PIL's (2.4 vs 13.3 ms for a 420^2 rgb template, measured);
        # the written PNGs stay standard and loader-agnostic.
        try:
            cv2.imwrite(
                rgb_path,
                (255.0 * np.clip(color, 0, 1)).astype(np.uint8)[:, :, ::-1],
            )
            save_depth_png(depth_path, depth)
            cv2.imwrite(mask_path, (mask * 255).astype(np.uint8))
        finally:
            write_slots.release()

    timer.start()
    render_pool = ThreadPoolExecutor(n_workers)
    io_pool = ThreadPoolExecutor(n_workers)
    write_futs = []
    pending = deque()
    view_iter = iter(range(num_views))

    def submit_next():
        view_idx = next(view_iter, None)
        if view_idx is not None:
            pending.append((view_idx, render_pool.submit(render_view, view_idx)))

    for _ in range(2 * n_workers + 1):
        submit_next()
    try:
        while pending:
            view_idx, fut = pending.popleft()
            res = fut.result()
            submit_next()
            if res is None:
                logger.info(f"Skipping empty template at view {view_idx}")
                continue
            crop_cam, color, depth, mask = res
            box = boxes[view_idx]

            rgb_path = os.path.join(output_dir, "rgb", f"template_{template_counter:04d}.png")
            depth_path = os.path.join(output_dir, "depth", f"template_{template_counter:04d}.png")
            mask_path = os.path.join(output_dir, "mask", f"template_{template_counter:04d}.png")
            write_slots.acquire()
            write_futs.append(
                io_pool.submit(
                    write_template, rgb_path, depth_path, mask_path,
                    color, depth, mask,
                )
            )

            metadata_list.append(
                {
                    "dataset": opts.object_dataset,
                    "lid": object_lid,
                    "template_id": template_counter,
                    "pose": {"R": np.eye(3).tolist(), "t": np.zeros((3, 1)).tolist()},
                    "boxes_amodal": [
                        [float(box[0]), float(box[1]),
                         float(box[2]), float(box[3])]
                    ],
                    "visibilities": [1.0],
                    "cameras": _camera_json(crop_cam),
                    "rgb_image_path": rgb_path,
                    "depth_map_path": depth_path,
                    "binary_mask_path": mask_path,
                    # Extra (reference ignores unknown keys): the mask PNG
                    # is exactly (depth > 0) — depth and mask come from the
                    # same rasterization and the same nearest-neighbor SSAA
                    # downsample — so gen_repre can derive it on device
                    # instead of decoding + uploading it.
                    "mask_is_depth_positive": True,
                }
            )
            template_counter += 1
        for fut in write_futs:
            fut.result()
    finally:
        # On success both pools are idle; on error this cancels queued
        # work so the function doesn't leave writer threads draining a
        # backlog behind the raised exception.
        render_pool.shutdown(wait=False, cancel_futures=True)
        io_pool.shutdown(wait=True, cancel_futures=True)
    timer.elapsed(
        f"Rendered {template_counter} templates ({n_workers} workers)"
    )

    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(metadata_list, f)
    return metadata_list


def synthesize_templates(opts: GenTemplatesOpts) -> None:
    """CLI driver over all objects. (reference: scripts/gen_templates.py:70-480)"""
    object_lids = opts.object_lids or bop.OBJECT_IDS.get(opts.object_dataset)
    object_lids = host_shard.shard_keys(
        object_lids, *host_shard.shard_of(opts)
    )
    models_info = bop.load_models_info(opts.bop_root, opts.object_dataset)
    for lid in object_lids:
        log_heading(logger, f"Object {lid} of {opts.object_dataset}")
        output_dir = os.path.join(
            opts.output_dir, opts.object_dataset, opts.version, str(lid)
        )
        if os.path.exists(output_dir) and not opts.overwrite:
            if opts.resume and os.path.exists(
                os.path.join(output_dir, "metadata.json")
            ):
                logger.info(f"Resume: templates exist for object {lid}, skipping.")
                continue
            raise ValueError(f"Output dir exists (overwrite=False): {output_dir}")
        os.makedirs(output_dir, exist_ok=True)
        config_util.save_opts(opts, os.path.join(output_dir, "config.json"))
        mesh = bop.load_object_model(opts.bop_root, opts.object_dataset, lid)
        synthesize_templates_for_object(
            mesh, models_info.get(lid, {}), opts, lid, output_dir
        )


def main() -> None:
    opts = config_util.load_opts(GenTemplatesOpts)
    synthesize_templates(opts)


if __name__ == "__main__":
    main()
