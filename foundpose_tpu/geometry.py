"""Pure-JAX 3D geometry primitives.

TPU-native re-design of the reference geometry layer
(reference: utils/geometry.py:15-229). All functions are jit-compatible,
broadcastable over leading batch dimensions and dtype-polymorphic, so they can
be vmapped/pjit-ed over crops, templates and RANSAC hypotheses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Small-matrix SE(3)/rotation math must run at full f32 precision on the MXU
# (TPU matmuls default to bf16 inputs); these ops are tiny so this is free.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b, precision=_HIGHEST)


def transform_points(matrix: Array, points: Array) -> Array:
    """Applies SE(3) transform(s) to 3D point(s).

    Args:
        matrix: [..., 3|4, 4] rigid transform(s) (last row [0,0,0,1] if 4x4).
        points: [..., 3] points; batch dims broadcast against the matrix.

    Returns:
        Transformed points [..., 3]. (reference: utils/geometry.py:90-107)
    """
    return rotate_points(matrix, points) + matrix[..., :3, 3]


def rotate_points(matrix: Array, points: Array) -> Array:
    """Rotates points/directions by the rotation part of an affine transform.

    (reference: utils/geometry.py:110-133)
    """
    return jnp.einsum(
        "...ij,...j->...i", matrix[..., :3, :3], points, precision=_HIGHEST
    )


def normalized(v: Array, axis: int = -1, eps: float = 5.43e-20) -> Array:
    """Unit-length copy of vector(s), safe for near-zero input.

    (reference: utils/geometry.py:215-229)
    """
    d = jnp.maximum(eps, jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True)))
    return v / d


def skew_matrix(v: Array) -> Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix. (reference: utils/geometry.py:152-156)"""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def from_two_vectors(a: Array, b: Array) -> Array:
    """Rotation matrix taking direction `a` to direction `b` (Rodrigues form).

    (reference: utils/geometry.py:135-150)
    """
    a = normalized(a)
    b = normalized(b)
    v = jnp.cross(a, b)
    s2 = jnp.sum(v * v, axis=-1)[..., None, None]
    c = jnp.sum(a * b, axis=-1)[..., None, None]
    vm = skew_matrix(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), vm.shape)
    # (1 - c) / s^2 with the s ~ 0 guard of the reference implementation.
    return eye + vm + _mm(vm, vm) * (1.0 - c) / jnp.maximum(s2, 1e-15)


def rotation_about_axis(angle: Array, direction: Array) -> Array:
    """4x4 rotation of `angle` [rad] around `direction` through the origin.

    (reference: utils/geometry.py:158-189)
    """
    direction = normalized(direction)
    sina = jnp.sin(angle)
    cosa = jnp.cos(angle)
    outer = jnp.einsum("...i,...j->...ij", direction, direction)
    r = cosa[..., None, None] * jnp.eye(3, dtype=direction.dtype)
    r = r + outer * (1.0 - cosa)[..., None, None]
    r = r + skew_matrix(direction * sina[..., None])
    return as_4x4_rt(r, jnp.zeros(r.shape[:-2] + (3,), dtype=r.dtype))


def as_4x4_rt(r: Array, t: Array) -> Array:
    """Builds [..., 4, 4] homogeneous transforms from [..., 3, 3] + [..., 3]."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def as_4x4(a: Array) -> Array:
    """Promotes [..., 3, 4] affine matrices to [..., 4, 4]. (reference: utils/geometry.py:190-212)"""
    if a.shape[-2:] == (4, 4):
        return a
    if a.shape[-2:] == (3, 4):
        return as_4x4_rt(a[..., :3, :3], a[..., :3, 3])
    raise ValueError("expected 3x4 or 4x4 affine transform")


def inverse_se3(m: Array) -> Array:
    """Closed-form inverse of rigid transform(s) [..., 4, 4]."""
    r_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", r_t, m[..., :3, 3], precision=_HIGHEST)
    return as_4x4_rt(r_t, t)


def rotate_z(angle_rad: Array, dtype=jnp.float32) -> Array:
    """3x3 rotation about +Z by `angle_rad`."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    ).astype(dtype)


def gen_look_at_matrix(
    orig_camera_from_world: Array,
    center_in_world: Array,
    camera_angle_deg: float = 0.0,
) -> Array:
    """Re-aims a camera so its +Z axis passes through `center_in_world`.

    Returns the new camera_from_world transform. Semantics match the
    reference crop-camera construction (reference: utils/geometry.py:52-88).
    """
    center_local = transform_points(orig_camera_from_world, center_in_world)
    z_dir_local = normalized(center_local)
    z_axis = jnp.array([0.0, 0.0, 1.0], dtype=center_local.dtype)
    delta_r_local = from_two_vectors(z_axis, z_dir_local)
    orig_world_from_camera = inverse_se3(orig_camera_from_world)

    rot = _mm(orig_world_from_camera[..., :3, :3], delta_r_local)
    angle = jnp.asarray(camera_angle_deg, dtype=rot.dtype) * (jnp.pi / 180.0)
    rot = _mm(rot, rotate_z(angle, dtype=rot.dtype))
    world_from_aligned = as_4x4_rt(rot, orig_world_from_camera[..., :3, 3])
    return inverse_se3(world_from_aligned)


def rotation_error_deg(r_est: Array, r_gt: Array) -> Array:
    """Geodesic rotation error in degrees. (reference: utils/eval_errors.py:71-86)"""
    r = jnp.einsum(
        "...ij,...kj->...ik", r_est, r_gt, precision=_HIGHEST
    )  # R_est @ R_gt^T
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def orthogonalize_rotation(m: Array) -> Array:
    """Projects [..., 3, 3] matrices to the closest rotation (via SVD)."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(_mm(u, vt))
    d = jnp.ones(m.shape[:-2] + (3,), dtype=m.dtype).at[..., 2].set(det)
    return _mm(u * d[..., None, :], vt)


def inverse_3x3(m: Array) -> Array:
    """Closed-form inverse of [..., 3, 3] matrices (adjugate / det).

    Pure elementwise ops — vectorizes over huge batches where LAPACK-style
    factorizations would serialize on TPU.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def polar_rotation(m: Array, iters: int = 8) -> Array:
    """Closest rotation to [..., 3, 3] matrices via Newton polar iteration.

    X <- (X + X^-T) / 2 with the closed-form 3x3 inverse — converges
    quadratically to the orthogonal polar factor for nonsingular input and
    batches perfectly on TPU (unlike batched tiny SVDs). Assumes det(m) > 0
    (callers fix the sign first, as the DLT scale normalization does).
    """
    x = m * (jnp.sqrt(3.0) / jnp.maximum(
        jnp.linalg.norm(m, axis=(-2, -1), keepdims=True), 1e-30))

    def body(x, _):
        x_inv_t = jnp.swapaxes(inverse_3x3(x), -1, -2)
        return 0.5 * (x + x_inv_t), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def rodrigues(rvec: Array) -> Array:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (jit/vmappable)."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    axis = rvec / jnp.where(theta < 1e-8, 1.0, theta)
    k = skew_matrix(axis)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), k.shape)
    r = eye + s * k + (1.0 - c) * _mm(k, k)
    return jnp.where(small[..., None, None], eye + skew_matrix(rvec), r)


def rodrigues_inv(r: Array) -> Array:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3]."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos)
    axis_raw = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(theta)
    # Regular case.
    scale = jnp.where(jnp.abs(sin) < 1e-7, 0.5, theta / jnp.maximum(2.0 * sin, 1e-12))
    regular = axis_raw * scale[..., None]
    # Near pi: axis from diagonal of (R + I) / 2.
    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    axis_pi = jnp.sqrt(jnp.maximum((diag + 1.0) / 2.0, 0.0))
    axis_pi = axis_pi * jnp.where(axis_raw >= 0, 1.0, -1.0)
    axis_pi = normalized(axis_pi)
    near_pi = theta[..., None] > (jnp.pi - 1e-3)
    return jnp.where(near_pi, axis_pi * theta[..., None], regular)
