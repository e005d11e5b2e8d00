"""Feature-map sampling, query-grid generation and mask filtering.

TPU-native re-design of the reference feature ops
(reference: utils/feature_util.py:25-157). The key departure: nothing here
changes array sizes at runtime. Mask "filtering" returns a fixed-size validity
mask over the full query grid instead of boolean indexing, which keeps every
downstream stage (tf-idf, buddies, RANSAC) static-shaped and jit-compilable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu.ops.warp import bilinear_sample

Array = jax.Array


def grid_points(grid_size: Tuple[int, int], cell_size: float) -> Array:
    """2D coordinates of regular-grid cell centers.

    Args:
        grid_size: (width, height) in pixels.
        cell_size: square cell side in pixels.
    Returns:
        [(W/cell)*(H/cell), 2] (x, y) coordinates, row-major over y then x in
        "xy" meshgrid order. (reference: utils/feature_util.py:25-52)
    """
    w, h = grid_size
    cols = int(w / cell_size)
    rows = int(h / cell_size)
    half = cell_size / 2.0
    xs = jnp.linspace(half, w - half, cols, dtype=jnp.float32)
    ys = jnp.linspace(half, h - half, rows, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def points_in_mask(points: Array, mask: Array) -> Array:
    """Validity of 2D points against a binary mask (fixed-size, no filtering).

    A point is valid if its +0.5-rounded integer pixel lies inside the canvas
    and on the mask, exactly matching the reference's filter semantics
    (reference: utils/feature_util.py:75-97) — but expressed as a mask so the
    point set keeps its static shape.
    """
    h, w = mask.shape
    pi = jnp.floor(points + 0.5).astype(jnp.int32)
    x, y = pi[..., 0], pi[..., 1]
    in_canvas = (x > 0) & (x < w) & (y > 0) & (y < h)
    xc = jnp.clip(x, 0, w - 1)
    yc = jnp.clip(y, 0, h - 1)
    on_mask = mask[yc, xc] > 0
    return in_canvas & on_mask


def sample_feature_map(
    feature_map_hwc: Array, points: Array, image_size: Tuple[int, int]
) -> Array:
    """Bilinear feature sampling at image-space 2D points.

    Matches torch grid_sample(align_corners=False) semantics over a feature
    map of lower resolution than the image: image coordinate p maps to
    feature-map coordinate p * (fm / image) - 0.5, with zero padding outside
    (reference: utils/feature_util.py:100-131).

    Args:
        feature_map_hwc: [Hf, Wf, C].
        points: [..., 2] (x, y) in image coordinates.
        image_size: (image_width, image_height).
    """
    hf, wf = feature_map_hwc.shape[0], feature_map_hwc.shape[1]
    iw, ih = image_size
    scale = jnp.asarray([wf / iw, hf / ih], dtype=points.dtype)
    fm_pts = points * scale - 0.5
    return bilinear_sample(feature_map_hwc, fm_pts)


def sample_grid_features(
    feature_map_hwc: Array,
    points: Array,
    image_size: Tuple[int, int],
    cell_size: float,
) -> Array:
    """`sample_feature_map` specialized for the regular query grid.

    PRECONDITION: `points` must be the row-major grid of cell centers
    produced by `grid_points(image_size, cell_size)` — i.e. point (r, c) at
    ((c+0.5)*cell, (r+0.5)*cell). Under jit the point VALUES are tracers and
    cannot be inspected, so the fast path is keyed on shapes alone there;
    arbitrary traced points that merely match the count would silently get
    the wrong features — callers with non-grid points must use
    `sample_feature_map` directly. For concrete inputs (numpy or committed
    jax arrays) the first and last points are validated against the expected
    grid corners and non-grid inputs fall back to true bilinear sampling.

    When the grid matches the feature map exactly — one cell per texel, the
    default for stride-14 DINOv2 on 14-px cells — every cell center lands on
    an integer feature-map coordinate ((i+0.5)*cell * wf/W - 0.5 == i), where
    bilinear weights degenerate to the identity: sampling is a reshape,
    saving the 4-neighbor gathers. (The bilinear path's f32 coordinate math
    lands ~1e-7 off-texel and interpolates by that epsilon; the reshape is
    the exact on-texel value — equality tested at 1e-4.) Falls back to true
    bilinear sampling otherwise (stride overrides, non-cell-aligned grids).
    """
    hf, wf = feature_map_hwc.shape[0], feature_map_hwc.shape[1]
    cols = int(image_size[0] / cell_size)
    rows = int(image_size[1] / cell_size)
    if (
        (wf, hf) == (cols, rows)
        and image_size[0] / wf == cell_size
        and image_size[1] / hf == cell_size
        and points.shape[0] == rows * cols
    ):
        # Cheap guard when point values are concrete (numpy or a committed
        # jax array — both inspectable; only tracers are not): the first and
        # last points must be the corresponding grid cell centers. Two
        # endpoint checks don't prove the interior is the grid, but they
        # catch the realistic misuse modes (shuffled/subsampled/arbitrary
        # point sets) at O(1) host-transfer cost.
        if not isinstance(points, jax.core.Tracer):
            ends = np.asarray(points[jnp.asarray([0, rows * cols - 1])])
            expect = np.asarray(
                [
                    [cell_size / 2.0, cell_size / 2.0],
                    [(cols - 0.5) * cell_size, (rows - 0.5) * cell_size],
                ]
            )
            if not np.allclose(ends, expect, atol=1e-4):
                return sample_feature_map(feature_map_hwc, points, image_size)
        return feature_map_hwc.reshape(rows * cols, feature_map_hwc.shape[-1])
    return sample_feature_map(feature_map_hwc, points, image_size)


def lift_points_to_3d(
    points: Array, depth_image: Array, cam_f: Array, cam_c: Array
) -> Array:
    """Lifts 2D image points to camera-space 3D using a depth image.

    Matches the reference's averaged-focal model with depth fetched at the
    floored pixel (reference: utils/feature_util.py:134-157).

    Args:
        points: [N, 2] (x, y) image coordinates.
        depth_image: [H, W] depth in the camera's units.
        cam_f: [2] (fx, fy); cam_c: [2] (cx, cy).
    Returns:
        [N, 3] camera-space points.
    """
    h, w = depth_image.shape
    focal = 0.5 * (cam_f[0] + cam_f[1])
    xy = points - cam_c
    ray = jnp.concatenate(
        [xy, jnp.full(points.shape[:-1] + (1,), 1.0, dtype=points.dtype) * focal],
        axis=-1,
    )
    xi = jnp.clip(jnp.floor(points[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(points[..., 1]).astype(jnp.int32), 0, h - 1)
    depths = depth_image[yi, xi]
    return ray * (depths / ray[..., 2])[..., None]


def subsample_points(
    points: Array, valid: Array, max_count: int, key: Optional[Array] = None
) -> Array:
    """Randomly keeps at most `max_count` valid points (mask update only).

    Jit-friendly analog of the reference's randperm subsampling
    (reference: scripts/infer.py:484-492): scores valid points with random
    keys and keeps the top `max_count` by masking out the rest.
    """
    n = points.shape[0]
    if key is None:
        return valid
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(valid, scores, -1.0)
    thresh = -jax.lax.top_k(scores, max_count)[0][-1]
    keep = scores >= -thresh
    return valid & keep
