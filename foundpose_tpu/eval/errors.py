"""Symmetry-aware pose error metrics (MSSD, MSPD, rotation/translation).

TPU-native re-design of the reference metrics
(reference: utils/eval_errors.py:12-118). The symmetry loop becomes a batched
axis: errors evaluate for all symmetry transforms at once as [S, N, 3]
matmuls, vmappable over estimates, so whole result sets score in one jit call.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_P = jax.lax.Precision.HIGHEST


def _apply_pose(r: Array, t: Array, pts: Array) -> Array:
    return jnp.einsum("...ij,nj->...ni", r, pts, precision=_P) + t[..., None, :]


def mssd(
    r_est: Array, t_est: Array, r_gt: Array, t_gt: Array,
    pts: Array, sym_r: Array, sym_t: Array,
) -> Tuple[Array, Array]:
    """Maximum Symmetry-aware Surface Distance.

    Args:
        pts: [N, 3] model points; sym_r: [S, 3, 3]; sym_t: [S, 3].
    Returns:
        (error, argmax vertex index of the best symmetry).
        (reference: utils/eval_errors.py:12-38)
    """
    pts_est = _apply_pose(r_est, t_est, pts)  # [N, 3]
    r_sym = jnp.einsum("ij,sjk->sik", r_gt, sym_r, precision=_P)
    t_sym = jnp.einsum("ij,sj->si", r_gt, sym_t, precision=_P) + t_gt
    pts_gt = _apply_pose(r_sym, t_sym, pts)  # [S, N, 3]
    err = jnp.linalg.norm(pts_gt - pts_est[None], axis=-1)  # [S, N]
    max_per_sym = jnp.max(err, axis=-1)
    best = jnp.argmin(max_per_sym)
    return max_per_sym[best], jnp.argmax(err[best])


def mspd(
    r_est: Array, t_est: Array, r_gt: Array, t_gt: Array,
    k: Array, pts: Array, sym_r: Array, sym_t: Array,
) -> Tuple[Array, Array]:
    """Maximum Symmetry-aware Projection Distance.

    (reference: utils/eval_errors.py:41-68)
    """

    def project(r, t):
        cam = _apply_pose(r, t, pts)
        uvw = jnp.einsum("ij,...nj->...ni", k, cam, precision=_P)
        return uvw[..., :2] / uvw[..., 2:3]

    proj_est = project(r_est, t_est)  # [N, 2]
    r_sym = jnp.einsum("ij,sjk->sik", r_gt, sym_r, precision=_P)
    t_sym = jnp.einsum("ij,sj->si", r_gt, sym_t, precision=_P) + t_gt
    proj_gt = project(r_sym, t_sym)  # [S, N, 2]
    err = jnp.linalg.norm(proj_est[None] - proj_gt, axis=-1)
    max_per_sym = jnp.max(err, axis=-1)
    best = jnp.argmin(max_per_sym)
    return max_per_sym[best], jnp.argmax(err[best])


def rotation_error_deg(r_est: Array, r_gt: Array) -> Array:
    """Geodesic rotation error [deg]. (reference: utils/eval_errors.py:71-86)"""
    from foundpose_tpu.geometry import rotation_error_deg as _re

    return _re(r_est, r_gt)


def translation_error(t_est: Array, t_gt: Array) -> Array:
    """L2 translation error. (reference: utils/eval_errors.py:99-107)"""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def mask_iou(mask1: Array, mask2: Array) -> Array:
    """IoU of two binary masks. (reference: utils/eval_errors.py:110-118)"""
    m1 = mask1 > 0
    m2 = mask2 > 0
    inter = jnp.sum((m1 & m2).astype(jnp.float32))
    union = jnp.sum((m1 | m2).astype(jnp.float32))
    return jnp.where(union > 0, inter / union, 0.0)


def vertex_error_percentiles(
    r_est: Array, t_est: Array, r_gt: Array, t_gt: Array, pts: Array
) -> dict:
    """Per-vertex distance percentiles used by the evaluator
    (reference: utils/eval_util.py:120-170)."""
    err = jnp.linalg.norm(
        _apply_pose(r_est, t_est, pts) - _apply_pose(r_gt, t_gt, pts), axis=-1
    )
    return {
        "mean": jnp.mean(err),
        "p50": jnp.percentile(err, 50),
        "p90": jnp.percentile(err, 90),
        "max": jnp.max(err),
    }
