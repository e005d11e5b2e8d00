"""Featuremetric pose refinement: LM over dense patch-feature residuals.

Implements the refinement stage of the FoundPose paper (§ featuremetric
refinement) which is NOT in the reference open-source release
(reference README.md:34 — only the coarse stage is released; BASELINE.json
lists this stage as a target config). Design:

For a template's registered 3D points X_i with descriptors f_i, the current
pose projects X_i into the query crop; the query feature map is sampled
bilinearly at those projections (differentiable), and Levenberg–Marquardt
minimizes sum_i || F_q(pi(R X_i + t)) - f_i ||^2 over (axis-angle, t).

Everything is fixed-iteration and mask-aware, so it vmaps over crops and runs
inside the same jitted program as the coarse stage.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from foundpose_tpu import geometry
from foundpose_tpu.ops.sampling import sample_feature_map

Array = jax.Array

_P = jax.lax.Precision.HIGHEST


def featuremetric_residuals(
    theta: Array,
    feature_map: Array,
    cam_f: Array,
    cam_c: Array,
    crop_size: Tuple[int, int],
    pts3d: Array,
    feats: Array,
    valid: Array,
) -> Array:
    """Flattened masked feature residuals for pose parameters theta=(rvec, t)."""
    rot = geometry.rodrigues(theta[:3])
    cam = jnp.einsum("ij,nj->ni", rot, pts3d, precision=_P) + theta[3:]
    z = jnp.maximum(cam[:, 2:3], 1e-6)
    proj = cam[:, :2] / z * cam_f + cam_c
    sampled = sample_feature_map(feature_map, proj, crop_size)
    # Out-of-viewport or invalid points contribute nothing.
    w, h = crop_size
    inside = (
        (proj[:, 0] > 0) & (proj[:, 0] < w - 1) & (proj[:, 1] > 0) & (proj[:, 1] < h - 1)
    )
    weight = (valid & inside & (cam[:, 2] > 0)).astype(feats.dtype)
    return ((sampled - feats) * weight[:, None]).reshape(-1)


@partial(jax.jit, static_argnames=("crop_size", "iters"))
def refine_pose_featuremetric(
    r0: Array,
    t0: Array,
    feature_map: Array,
    cam_f: Array,
    cam_c: Array,
    pts3d: Array,
    feats: Array,
    valid: Array,
    crop_size: Tuple[int, int] = (420, 420),
    iters: int = 10,
) -> tuple[Array, Array, Array]:
    """LM refinement of (R, t) against the dense query feature map.

    Args:
        r0, t0: coarse pose (model -> crop camera).
        feature_map: [Hf, Wf, D] query crop feature map (PCA space, same space
            as `feats`).
        pts3d: [N, 3] template 3D points; feats: [N, D]; valid: [N] bool.
    Returns:
        (R, t, final_cost).
    """
    theta0 = jnp.concatenate([geometry.rodrigues_inv(r0), t0])

    def residuals(theta):
        return featuremetric_residuals(
            theta, feature_map, cam_f, cam_c, crop_size, pts3d, feats, valid
        )

    def step(carry, _):
        theta, lam = carry
        res = residuals(theta)
        jac = jax.jacfwd(residuals)(theta)  # [N*D, 6] via 6 forward passes
        jtj = jnp.einsum("ri,rj->ij", jac, jac, precision=_P)
        jtr = jac.T @ res
        cost = jnp.sum(res * res)
        delta = jnp.linalg.solve(jtj + lam * jnp.diag(jnp.diag(jtj)) +
                                 1e-9 * jnp.eye(6, dtype=theta.dtype), jtr)
        theta_new = theta - delta
        new_cost = jnp.sum(jnp.square(residuals(theta_new)))
        improved = new_cost < cost
        theta = jnp.where(improved, theta_new, theta)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-6, 1e8)
        return (theta, lam), None

    (theta, _), _ = jax.lax.scan(step, (theta0, jnp.asarray(1e-2)), None, length=iters)
    final_cost = jnp.sum(jnp.square(residuals(theta)))
    return geometry.rodrigues(theta[:3]), theta[3:], final_cost
