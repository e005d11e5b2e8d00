"""Camera construction utilities: crop cameras and viewsphere sampling.

TPU-native re-design of the reference camera-crop math
(reference: utils/misc.py:47-277). `construct_crop_camera` is fully
jit/vmap-compatible so per-detection virtual cameras are built on-device for
whole batches of crops at once, instead of one numpy camera per Python-loop
iteration as in the reference.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu import geometry
from foundpose_tpu.structs import PinholeCamera, box_height, box_width

Array = jax.Array


def calc_crop_box(box: Array, scaling_factor: float = 1.0, make_square: bool = True) -> Array:
    """Inflates a (x1, y1, x2, y2) box and optionally makes it square.

    (reference: utils/misc.py:171-205)
    """
    w = box_width(box) * scaling_factor
    h = box_height(box) * scaling_factor
    if make_square:
        side = jnp.maximum(w, h)
        w = side
        h = side
    x_pad = 0.5 * (w - box_width(box))
    y_pad = 0.5 * (h - box_height(box))
    return jnp.stack(
        [box[..., 0] - x_pad, box[..., 1] - y_pad, box[..., 2] + x_pad, box[..., 3] + y_pad],
        axis=-1,
    )


def construct_crop_camera(
    box: Array,
    camera_c2w: PinholeCamera,
    viewport_size: Tuple[int, int],
    viewport_rel_pad: float,
) -> PinholeCamera:
    """Virtual pinhole camera aimed at a 2D box of the source camera.

    The camera's optical axis passes through the centroid of the box corners'
    viewing directions, and the focal length is set such that the bounding
    sphere of those directions (padded by `viewport_rel_pad`) fills the
    viewport. Jit/vmap-friendly. (reference: utils/misc.py:208-277)
    """
    f = 0.5 * (camera_c2w.f[..., 0] + camera_c2w.f[..., 1])
    cx, cy = camera_c2w.c[..., 0], camera_c2w.c[..., 1]
    corners_x = jnp.stack([box[..., 0], box[..., 2], box[..., 0], box[..., 2]], axis=-1) - cx[..., None]
    corners_y = jnp.stack([box[..., 1], box[..., 1], box[..., 3], box[..., 3]], axis=-1) - cy[..., None]
    corners_z = jnp.broadcast_to(f[..., None], corners_x.shape)
    corners = jnp.stack([corners_x, corners_y, corners_z], axis=-1)  # [..., 4, 3]
    corners = corners / jnp.linalg.norm(corners, axis=-1, keepdims=True)

    centroid = jnp.mean(corners, axis=-2)  # [..., 3]
    centroid_in_w = geometry.transform_points(camera_c2w.T_world_from_eye, centroid)
    radius = jnp.max(jnp.linalg.norm(corners - centroid[..., None, :], axis=-1), axis=-1)

    trans_w2c = geometry.inverse_se3(camera_c2w.T_world_from_eye)
    trans_w2vc = geometry.gen_look_at_matrix(trans_w2c, centroid_in_w)
    centroid_in_vc = geometry.transform_points(trans_w2vc, centroid_in_w)

    fx_fy_orig = camera_c2w.f
    radius_2d = fx_fy_orig * (radius / centroid_in_vc[..., 2])[..., None]
    extent_2d = (1.0 + viewport_rel_pad) * radius_2d

    cx_cy = jnp.asarray(viewport_size, dtype=fx_fy_orig.dtype) / 2.0 - 0.5
    fx_fy = fx_fy_orig * cx_cy / extent_2d

    return PinholeCamera(
        f=fx_fy,
        c=jnp.broadcast_to(cx_cy, fx_fy.shape),
        T_world_from_eye=geometry.inverse_se3(trans_w2vc),
        width=int(viewport_size[0]),
        height=int(viewport_size[1]),
    )


def build_crop_cameras(
    camera_c2w: PinholeCamera,
    boxes_xyxy: Array,
    viewport_size: Tuple[int, int],
    viewport_rel_pad: float,
) -> PinholeCamera:
    """Batched crop cameras for N detection boxes of ONE source camera.

    One vectorized call (box inflation + virtual-camera construction ride
    the `...` batch dims of calc_crop_box/construct_crop_camera) replacing
    the per-detection python loop: the loop's op count scales with N and
    each eager dispatch costs real time on host/tunneled backends (median
    161 ms/instance host prep measured in benchmarks/cli_throughput.py);
    here the op count is constant in N.
    """
    n = boxes_xyxy.shape[0]
    cam_b = PinholeCamera(
        f=jnp.broadcast_to(camera_c2w.f, (n, 2)),
        c=jnp.broadcast_to(camera_c2w.c, (n, 2)),
        T_world_from_eye=jnp.broadcast_to(
            camera_c2w.T_world_from_eye, (n, 4, 4)
        ),
        width=camera_c2w.width,
        height=camera_c2w.height,
    )
    crop_boxes = calc_crop_box(boxes_xyxy, make_square=True)
    return construct_crop_camera(
        box=crop_boxes,
        camera_c2w=cam_b,
        viewport_size=viewport_size,
        viewport_rel_pad=viewport_rel_pad,
    )


# ---------------------------------------------------------------------------
# Viewsphere sampling (host-side, feeds offline template generation).
# ---------------------------------------------------------------------------


def fibonacci_sphere(n_pts: int, radius: float = 1.0) -> np.ndarray:
    """Odd-count Fibonacci lattice on a sphere. (reference: utils/misc.py:47-89)"""
    assert n_pts % 2 == 1
    half = n_pts // 2
    phi = (math.sqrt(5.0) + 1.0) / 2.0
    ga = 2.0 * math.pi * (phi - 1.0)
    i = np.arange(-half, half + 1, dtype=np.float64)
    lat = np.arcsin(2.0 * i / (2 * half + 1))
    lon = np.mod(ga * i, 2.0 * math.pi)
    s = np.cos(lat) * radius
    return np.stack([np.cos(lon) * s, np.sin(lon) * s, np.tan(lat) * s], axis=-1)


def sample_views(
    min_n_views: int,
    radius: float = 1.0,
    azimuth_range: Tuple[float, float] = (0.0, 2.0 * math.pi),
    elev_range: Tuple[float, float] = (-0.5 * math.pi, 0.5 * math.pi),
) -> List[dict]:
    """Samples camera views on a sphere looking at the origin (OpenCV frame).

    Returns a list of {"R": 3x3, "t": 3x1} world-to-camera transforms.
    (reference: utils/misc.py:91-168)
    """
    n_views = min_n_views if min_n_views % 2 == 1 else min_n_views + 1
    pts = fibonacci_sphere(n_views, radius=radius)

    views = []
    for pt in pts:
        azimuth = math.atan2(pt[1], pt[0])
        if azimuth < 0:
            azimuth += 2.0 * math.pi
        a = np.linalg.norm(pt)
        b = np.linalg.norm([pt[0], pt[1], 0.0])
        elev = math.acos(np.clip(b / a, -1.0, 1.0))
        if pt[2] < 0:
            elev = -elev
        if not (
            azimuth_range[0] <= azimuth <= azimuth_range[1]
            and elev_range[0] <= elev <= elev_range[1]
        ):
            continue

        # gluLookAt-style frame, then OpenGL -> OpenCV flip about X.
        fwd = -pt / np.linalg.norm(pt)
        up = np.array([0.0, 0.0, 1.0])
        side = np.cross(fwd, up)
        if np.count_nonzero(side) == 0:
            side = np.array([1.0, 0.0, 0.0])
        side /= np.linalg.norm(side)
        up = np.cross(side, fwd)
        r = np.stack([side, up, -fwd], axis=0)
        flip = np.diag([1.0, -1.0, -1.0])
        r = flip @ r
        t = -r @ pt.reshape(3, 1)
        views.append({"R": r, "t": t})
    return views


def inplane_rotated_views(views: List[dict], num_inplane_rotations: int) -> List[dict]:
    """Augments each view with in-plane rotations about the optical axis.

    (reference: scripts/gen_templates.py:167-183)
    """
    out = []
    step = 2.0 * math.pi / num_inplane_rotations
    for view in views:
        for i in range(num_inplane_rotations):
            angle = i * step
            rz = np.array(
                [
                    [math.cos(angle), -math.sin(angle), 0.0],
                    [math.sin(angle), math.cos(angle), 0.0],
                    [0.0, 0.0, 1.0],
                ]
            )
            out.append({"R": rz @ view["R"], "t": rz @ view["t"]})
    return out


def view_sphere_radii(
    depth_range: Tuple[float, float], num_spheres: int
) -> List[float]:
    """Viewsphere radii spanning the test-set depth range.

    (reference: scripts/gen_templates.py:147-154)
    """
    depth_min, depth_max = depth_range
    if num_spheres == 1:
        return [0.5 * (depth_min + depth_max)]
    step = (depth_max - depth_min) / (num_spheres - 1)
    return [depth_min + i * step for i in range(num_spheres)]
