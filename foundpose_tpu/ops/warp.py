"""Camera-to-camera image warping as gather-based resampling.

TPU-native replacement for the reference's cv2.remap-based warps
(reference: utils/misc.py:458-556). The backward map is computed with the
batched camera pytrees, and sampling is a vectorized bilinear/nearest gather
that XLA fuses — so warping whole batches of detections runs on-device instead
of one cv2 call per instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from foundpose_tpu.structs import PinholeCamera

Array = jax.Array


def bilinear_sample(image: Array, xy: Array, fill_value: float = 0.0) -> Array:
    """Bilinear sampling of an HW[C] image at float pixel coords.

    Integer coordinates correspond to pixel centers (cv2.remap convention).
    Out-of-range samples return `fill_value`.

    Args:
        image: [H, W] or [H, W, C].
        xy: [..., 2] (x, y) sample locations.
    Returns:
        [...,] or [..., C] samples.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[0], image.shape[1]

    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = image[yi_c, xi_c]
        return jnp.where(valid[..., None], vals, fill_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out[..., 0] if squeeze else out


def nearest_sample(image: Array, xy: Array, fill_value: float = 0.0) -> Array:
    """Nearest-neighbor sampling with the same conventions as bilinear_sample."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[0], image.shape[1]
    xi = jnp.round(xy[..., 0]).astype(jnp.int32)
    yi = jnp.round(xy[..., 1]).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    vals = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    out = jnp.where(valid[..., None], vals, jnp.asarray(fill_value, dtype=image.dtype))
    return out[..., 0] if squeeze else out


def backward_map(
    src_camera: PinholeCamera,
    dst_camera: PinholeCamera,
    depth_check: bool = True,
) -> Array:
    """Per-destination-pixel source coordinates [(dst_H, dst_W), 2].

    (reference: utils/misc.py:494-516)
    """
    hh, ww = dst_camera.height, dst_camera.width
    px = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
    dst_win = jnp.stack([px, py], axis=-1)

    dst_eye = dst_camera.window_to_eye(dst_win)
    world = dst_camera.eye_to_world(dst_eye)
    src_eye = src_camera.world_to_eye(world)
    src_win = src_camera.eye_to_window(src_eye)
    if depth_check:
        behind = src_eye[..., 2] < 0
        src_win = jnp.where(behind[..., None], -1.0, src_win)
    return src_win


def warp_image(
    src_camera: PinholeCamera,
    dst_camera: PinholeCamera,
    src_image: Array,
    interpolation: str = "bilinear",
    depth_check: bool = True,
) -> Array:
    """Warps an HW[C] image from the source to the destination camera.

    interpolation: "bilinear", "nearest", or "area2x" — a 2x2-supersampled
    bilinear warp approximating cv2.INTER_AREA for moderate downscales (the
    reference picks INTER_AREA when the crop box is wider than the viewport,
    scripts/infer.py:433-437). (reference warp: utils/misc.py:458-519)
    """
    if interpolation == "area2x":
        # Average 4 bilinear samples taken at destination quarter-pixel
        # offsets, mapped through the camera chain.
        hh, ww = dst_camera.height, dst_camera.width
        px = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
        py = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
        acc = None
        for dx in (-0.25, 0.25):
            for dy in (-0.25, 0.25):
                win = jnp.stack([px + dx, py + dy], axis=-1)
                eye = dst_camera.window_to_eye(win)
                world = dst_camera.eye_to_world(eye)
                src_eye = src_camera.world_to_eye(world)
                src_win = src_camera.eye_to_window(src_eye)
                if depth_check:
                    src_win = jnp.where(src_eye[..., 2:3] < 0, -1.0, src_win)
                s = bilinear_sample(src_image, src_win)
                acc = s if acc is None else acc + s
        return acc / 4.0

    src_win = backward_map(src_camera, dst_camera, depth_check=depth_check)
    if interpolation == "bilinear":
        return bilinear_sample(src_image, src_win)
    elif interpolation == "nearest":
        return nearest_sample(src_image, src_win)
    raise ValueError(f"unknown interpolation: {interpolation}")


def warp_depth_image(
    src_camera: PinholeCamera,
    dst_camera: PinholeCamera,
    src_depth: Array,
    depth_check: bool = True,
) -> Array:
    """Warps a depth image, re-projecting depth values when extrinsics change.

    Jit-friendly reformulation of the reference (utils/misc.py:522-556): the
    per-pixel point cloud is built densely and re-projected with `where`
    masking instead of boolean indexing.
    """
    h, w = src_depth.shape
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    win = jnp.stack([px, py], axis=-1)

    rays = src_camera.window_to_eye(win)  # unit rays
    valid = src_depth > 0
    scale = jnp.where(valid, src_depth / jnp.where(rays[..., 2] == 0, 1.0, rays[..., 2]), 0.0)
    pts_src = rays * scale[..., None]
    pts_w = src_camera.eye_to_world(pts_src)
    pts_dst = dst_camera.world_to_eye(pts_w)
    new_depth = jnp.where(valid, pts_dst[..., 2], 0.0)

    return warp_image(
        src_camera, dst_camera, new_depth, interpolation="nearest", depth_check=depth_check
    )


def make_single_image_warp(crop_size):
    """Factory for a jitted warp of ONE image into many crop cameras.
    Accepts any (w, h) sequence; see _make_single_image_warp."""
    return _make_single_image_warp(tuple(crop_size))


@functools.lru_cache(maxsize=None)
def _make_single_image_warp(crop_size):
    """Memoized factory for a jitted warp of ONE image into many crop cameras.

    The image and the source camera are plain (traced) arguments and only the
    per-detection masks/destination cameras are batched under vmap, so no
    [n, H, W, 3] image replicas are ever materialized — with n detections per
    image the old batched layout copied the full image n times through host
    memory and HBM (the reference pays the same per-instance cost as n
    cv2.remap calls, scripts/infer.py:438-449). Used by both the serving
    engine and the infer CLI so the two host paths cannot drift.

    Memoized on crop_size: repeated factory calls (multiple engines, repeated
    infer() runs in one process) return the SAME jitted callable, so the
    compiled executables are reused instead of re-traced per call site.

    Dtype contract: a uint8 image (+ any-dtype masks) yields uint8 crops and
    uint8 {0,1} crop masks — the warp computes in f32 internally and
    re-quantizes, exactly the quantization the reference's cv2.remap on
    uint8 images has (scripts/infer.py:438-449) — which cuts host<->device
    transfer of the crops 4x. Float inputs keep float outputs (engine path).
    """

    @jax.jit
    def warp(image, masks, src_cam: PinholeCamera, dst_cams: PinholeCamera):
        u8 = image.dtype == jnp.uint8
        img = image.astype(jnp.float32) / 255.0 if u8 else image
        msks = masks.astype(jnp.float32)

        def one(msk, df, dc, dt):
            dst = PinholeCamera(f=df, c=dc, T_world_from_eye=dt,
                                width=crop_size[0], height=crop_size[1])
            # area2x tracks the reference's INTER_AREA choice for downscaling
            # crops and degrades gracefully to (slightly smoothed) bilinear
            # when upsampling (reference: scripts/infer.py:433-443).
            out_img = warp_image(src_cam, dst, img, interpolation="area2x")
            out_msk = warp_image(src_cam, dst, msk, interpolation="nearest")
            return out_img, out_msk

        out_imgs, out_msks = jax.vmap(one)(
            msks, dst_cams.f, dst_cams.c, dst_cams.T_world_from_eye
        )
        if u8:
            out_imgs = jnp.clip(
                jnp.round(out_imgs * 255.0), 0, 255
            ).astype(jnp.uint8)
            out_msks = (out_msks > 0.5).astype(jnp.uint8)
        return out_imgs, out_msks

    return warp
