"""Featuremetric pose refinement: LM over dense patch-feature residuals.

Implements the refinement stage of the FoundPose paper (§ featuremetric
refinement) which is NOT in the reference open-source release
(reference README.md:34 — only the coarse stage is released; BASELINE.json
lists this stage as a target config). Design:

For a template's registered 3D points X_i with descriptors f_i, the current
pose projects X_i into the query crop; the query feature map is sampled
bilinearly at those projections (differentiable), and Levenberg–Marquardt
minimizes sum_i || F_q(pi(R X_i + t)) - f_i ||^2 over a local SE(3) twist.

The Jacobian is ANALYTIC, not AD: J_i = dF/du (the bilinear field gradient,
free from the same 4 corner gathers the sample itself needs) composed with
the standard 2x6 projection Jacobian under a left-multiplied twist
(R <- exp(-dw^) R, t <- t - dt). jacfwd over the 6 pose parameters pushed 6
tangent gathers through every texel fetch — the analytic form runs the
gathers ONCE per iteration (plus one more for the acceptance test), which
measured 2.7x faster end-to-end at batch 64 on v5e (refine cost
99.5 -> 36.9 ms/batch; benchmarks/featuremetric_bench.py).

Everything is fixed-iteration and mask-aware, so it vmaps over crops and runs
inside the same jitted program as the coarse stage.

Characterization (round 5): accuracy
benchmarks/results/featuremetric_accuracy_r05.json, device cost
benchmarks/results/featuremetric_device_cost_r05.json, trade table
docs/KERNELS.md §7; shipped config configs/infer/lmo_refine.json.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from foundpose_tpu import geometry

Array = jax.Array

_P = jax.lax.Precision.HIGHEST


def _sample_with_grad(
    feature_map: Array, pts_px: Array, crop_size: Tuple[int, int]
) -> Tuple[Array, Array, Array]:
    """Bilinear sample + analytic spatial gradient at image-space points.

    Value matches ops/sampling.sample_feature_map exactly (grid_sample
    align_corners=False convention: pixel p -> fm coord p * (fm/img) - 0.5,
    zero fill outside). Returns (val [N, D], d/dx [N, D], d/dy [N, D]) with
    the gradients already in per-image-pixel units.
    """
    hf, wf = feature_map.shape[0], feature_map.shape[1]
    iw, ih = crop_size
    sx = wf / iw
    sy = hf / ih
    u = pts_px[:, 0] * sx - 0.5
    v = pts_px[:, 1] * sy - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[:, None]
    fy = (v - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < wf) & (yi >= 0) & (yi < hf)
        vals = feature_map[jnp.clip(yi, 0, hf - 1), jnp.clip(xi, 0, wf - 1)]
        return jnp.where(valid[:, None], vals, jnp.zeros((), vals.dtype))

    c00 = gather(y0i, x0i)
    c10 = gather(y0i, x0i + 1)
    c01 = gather(y0i + 1, x0i)
    c11 = gather(y0i + 1, x0i + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    val = top * (1.0 - fy) + bot * fy
    dval_dx = ((c10 - c00) * (1.0 - fy) + (c11 - c01) * fy) * jnp.asarray(
        sx, val.dtype
    )
    dval_dy = (bot - top) * jnp.asarray(sy, val.dtype)
    return val, dval_dx, dval_dy


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
    w_px, h_px = crop_size
    pts32 = pts3d.astype(jnp.float32)

    def project(r, t):
        cam = jnp.einsum("ij,nj->ni", r, pts32, precision=_P) + t
        z = jnp.maximum(cam[:, 2], 1e-6)
        proj = cam[:, :2] / z[:, None] * cam_f + cam_c
        return cam, z, proj

    def point_weight(cam, proj):
        inside = (
            (proj[:, 0] > 0)
            & (proj[:, 0] < w_px - 1)
            & (proj[:, 1] > 0)
            & (proj[:, 1] < h_px - 1)
        )
        return (valid & inside & (cam[:, 2] > 0)).astype(jnp.float32)

    def cost_at(r, t):
        cam, _, proj = project(r, t)
        val, _, _ = _sample_with_grad(feature_map, proj, crop_size)
        w = point_weight(cam, proj)
        res = (val.astype(jnp.float32) - feats.astype(jnp.float32)) * w[:, None]
        return jnp.sum(res * res)

    fx_c = cam_f[0].astype(jnp.float32)
    fy_c = cam_f[1].astype(jnp.float32)

    def step(carry, _):
        r, t, lam = carry
        cam, z, proj = project(r, t)
        val, gx, gy = _sample_with_grad(feature_map, proj, crop_size)
        w = point_weight(cam, proj)
        res = (val.astype(jnp.float32) - feats.astype(jnp.float32)) * w[:, None]
        cost = jnp.sum(res * res)

        # du/d(delta) [N, 2, 6] for the left twist q = exp(dw^)(R X) + t + dt:
        # dq/ddw = -[R X]^x = -[cam - t]^x, dq/ddt = I, composed with the
        # pinhole Jacobian A = dproj/dq.
        zf = z
        zeros = jnp.zeros_like(zf)
        a_row0 = jnp.stack([fx_c / zf, zeros, -fx_c * cam[:, 0] / (zf * zf)], -1)
        a_row1 = jnp.stack([zeros, fy_c / zf, -fy_c * cam[:, 1] / (zf * zf)], -1)
        a = jnp.stack([a_row0, a_row1], axis=1)  # [N, 2, 3]
        rp = cam - t
        skew = jnp.stack(
            [
                jnp.stack([zeros, -rp[:, 2], rp[:, 1]], -1),
                jnp.stack([rp[:, 2], zeros, -rp[:, 0]], -1),
                jnp.stack([-rp[:, 1], rp[:, 0], zeros], -1),
            ],
            axis=1,
        )  # [N, 3, 3]
        du = jnp.concatenate(
            [-jnp.einsum("nij,njk->nik", a, skew, precision=_P), a], axis=-1
        )  # [N, 2, 6]

        # J [N, D, 6] = field gradient composed with du, masked.
        gxf = (gx.astype(jnp.float32) * w[:, None])[:, :, None]
        gyf = (gy.astype(jnp.float32) * w[:, None])[:, :, None]
        jac = gxf * du[:, None, 0, :] + gyf * du[:, None, 1, :]

        jtj = jnp.einsum("ndk,ndl->kl", jac, jac, precision=_P)
        jtr = jnp.einsum("ndk,nd->k", jac, res, precision=_P)
        delta = jnp.linalg.solve(
            jtj
            + lam * jnp.diag(jnp.diag(jtj))
            + 1e-9 * jnp.eye(6, dtype=jnp.float32),
            jtr,
        )
        r_new = geometry.rodrigues(-delta[:3]) @ r
        t_new = t - delta[3:]
        new_cost = cost_at(r_new, t_new)
        improved = new_cost < cost
        r = jnp.where(improved, r_new, r)
        t = jnp.where(improved, t_new, t)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 5.0), 1e-6, 1e8)
        return (r, t, lam), None

    r0f = r0.astype(jnp.float32)
    t0f = t0.astype(jnp.float32)
    (r, t, _), _ = jax.lax.scan(
        step, (r0f, t0f, jnp.asarray(1e-2, jnp.float32)), None, length=iters
    )
    return r, t, cost_at(r, t)
