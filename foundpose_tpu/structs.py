"""Core pytree data structures.

TPU-native re-design of the reference core structs
(reference: utils/structs.py:35-680). Unlike the reference's stateful
`CameraModel` class hierarchy, cameras here are immutable flax pytrees whose
array fields may carry leading batch dimensions, so entire camera banks can be
vmapped/sharded. Static metadata (viewport size) lives outside the pytree
leaves so shapes stay compile-time constants under jit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class ObjectPose:
    """Rigid model-to-X pose. (reference: utils/structs.py:35-45)"""

    R: Array  # [..., 3, 3]
    t: Array  # [..., 3]

    @property
    def matrix(self) -> Array:
        from foundpose_tpu import geometry

        return geometry.as_4x4_rt(self.R, self.t)


@struct.dataclass
class PinholeCamera:
    """Pinhole camera with fx/fy focal, principal point and extrinsics.

    `T_world_from_eye` maps eye (camera) coordinates to world coordinates.
    Width/height are static (non-pytree) fields: image shapes must be static
    under jit anyway. (reference: utils/structs.py:255-680)
    """

    f: Array  # [..., 2] (fx, fy)
    c: Array  # [..., 2] (cx, cy)
    T_world_from_eye: Array  # [..., 4, 4]
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    # ---- constructors -----------------------------------------------------

    @classmethod
    def create(
        cls,
        f,
        c,
        width: int,
        height: int,
        T_world_from_eye=None,
        dtype=jnp.float32,
    ) -> "PinholeCamera":
        f = jnp.broadcast_to(jnp.asarray(f, dtype=dtype), (2,))
        c = jnp.asarray(c, dtype=dtype)
        if T_world_from_eye is None:
            T_world_from_eye = jnp.eye(4, dtype=dtype)
        else:
            T_world_from_eye = jnp.asarray(T_world_from_eye, dtype=dtype)
            if T_world_from_eye.shape[-2:] == (3, 4):
                from foundpose_tpu import geometry

                T_world_from_eye = geometry.as_4x4(T_world_from_eye)
        return cls(
            f=f, c=c, T_world_from_eye=T_world_from_eye, width=int(width), height=int(height)
        )

    @classmethod
    def from_intrinsic_matrix(
        cls, K, width: int, height: int, T_world_from_eye=None, dtype=jnp.float32
    ) -> "PinholeCamera":
        K = jnp.asarray(K, dtype=dtype)
        return cls.create(
            f=jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1),
            c=jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1),
            width=width,
            height=height,
            T_world_from_eye=T_world_from_eye,
            dtype=dtype,
        )

    # ---- intrinsics -------------------------------------------------------

    @property
    def K(self) -> Array:
        """3x3 intrinsic matrix (batched). (reference: utils/structs.py:674-680)"""
        fx, fy = self.f[..., 0], self.f[..., 1]
        cx, cy = self.c[..., 0], self.c[..., 1]
        zero = jnp.zeros_like(fx)
        one = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, zero, cx], axis=-1),
                jnp.stack([zero, fy, cy], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )

    @property
    def T_eye_from_world(self) -> Array:
        from foundpose_tpu import geometry

        return geometry.inverse_se3(self.T_world_from_eye)

    # ---- projections (batched; see reference utils/structs.py:405-540) ----

    def eye_to_window(self, v: Array) -> Array:
        """Projects eye-space points [..., 3] to 2D window coords [..., 2]."""
        p = v[..., :2] / v[..., 2:3]
        return p * self.f + self.c

    def window_to_eye(self, w: Array) -> Array:
        """Unprojects 2D window coords to unit-length eye rays [..., 3]."""
        from foundpose_tpu import geometry

        q = (w - self.c) / self.f
        ones = jnp.ones(q.shape[:-1] + (1,), dtype=q.dtype)
        return geometry.normalized(jnp.concatenate([q, ones], axis=-1))

    def window_to_eye_ray(self, w: Array) -> Array:
        """Unprojects 2D window coords to z=1 eye rays [..., 3] (not normalized)."""
        q = (w - self.c) / self.f
        ones = jnp.ones(q.shape[:-1] + (1,), dtype=q.dtype)
        return jnp.concatenate([q, ones], axis=-1)

    def world_to_eye(self, v: Array) -> Array:
        from foundpose_tpu import geometry

        t = self.T_world_from_eye
        return jnp.einsum(
            "...ji,...j->...i",
            t[..., :3, :3],
            v - t[..., :3, 3],
            precision=jax.lax.Precision.HIGHEST,
        )

    def eye_to_world(self, v: Array) -> Array:
        from foundpose_tpu import geometry

        return geometry.transform_points(self.T_world_from_eye, v)

    def world_to_window(self, v: Array) -> Array:
        return self.eye_to_window(self.world_to_eye(v))

    def window_visible(self, w: Array, margin: float = 0.0) -> Array:
        """Boolean visibility of 2D window coords. (reference: utils/structs.py:560-573)"""
        x, y = w[..., 0], w[..., 1]
        return (
            (x > -margin - 0.5)
            & (x < self.width + margin - 0.5)
            & (y >= -margin - 0.5)
            & (y < self.height + margin - 0.5)
        )


def aligned_box(left, top, right, bottom, dtype=jnp.float32) -> Array:
    """2D axis-aligned box as a plain [..., 4] (x1, y1, x2, y2) array.

    The reference wraps this in a class (utils/structs.py:115-253); here a box
    is just an array so it flows through jit/vmap without ceremony.
    """
    return jnp.stack(
        [
            jnp.asarray(left, dtype=dtype),
            jnp.asarray(top, dtype=dtype),
            jnp.asarray(right, dtype=dtype),
            jnp.asarray(bottom, dtype=dtype),
        ],
        axis=-1,
    )


def box_width(box: Array) -> Array:
    return box[..., 2] - box[..., 0]


def box_height(box: Array) -> Array:
    return box[..., 3] - box[..., 1]


def box_from_mask(mask: Array) -> Array:
    """Tight (x1, y1, x2, y2) box around nonzero mask pixels.

    Jit-friendly replacement for the reference's nonzero-based box
    (utils/misc.py:279-306): min/max over masked index grids.
    Returns zeros for an empty mask.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    m = mask > 0
    big = jnp.asarray(jnp.inf, dtype=jnp.float32)
    x1 = jnp.min(jnp.where(m, xs, big), axis=(-2, -1))
    y1 = jnp.min(jnp.where(m, ys, big), axis=(-2, -1))
    x2 = jnp.max(jnp.where(m, xs, -big), axis=(-2, -1))
    y2 = jnp.max(jnp.where(m, ys, -big), axis=(-2, -1))
    any_valid = jnp.any(m, axis=(-2, -1))
    box = jnp.stack([x1, y1, x2, y2], axis=-1)
    return jnp.where(any_valid[..., None], box, jnp.zeros_like(box))
