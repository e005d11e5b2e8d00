"""Binary morphology as jitted min/max pooling.

TPU-native replacement for kornia erosion / cv2 morphology
(reference: utils/feature_util.py:184-191 uses a 5x5 kornia erosion;
utils/infer_pose_util.py:87-91 uses a 3x3 cv2 opening). Implemented with
`lax.reduce_window`, which XLA lowers to vectorized pooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _window(mask: Array, kernel_size: int, op, init):
    pad = kernel_size // 2
    return jax.lax.reduce_window(
        mask,
        init,
        op,
        window_dimensions=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


def erode(mask: Array, kernel_size: int = 5, border: str = "zero") -> Array:
    """Binary erosion with a square all-ones kernel.

    border="zero" matches kornia's default (outside = 0: border pixels erode
    away, as used on template masks at reference feature_util.py:184-191);
    border="replicate" matches cv2.erode's default (outside is neutral, border
    pixels survive, as in the detection-mask opening at
    reference infer_pose_util.py:87-91).
    """
    m = (mask > 0).astype(jnp.float32)
    out = _window(m, kernel_size, jax.lax.min, jnp.float32(1.0))
    if border == "zero":
        # reduce_window pads with the (neutral) init value; zero out the ring
        # whose windows extend past the image.
        h, w = mask.shape
        pad = kernel_size // 2
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = (ys >= pad) & (ys < h - pad) & (xs >= pad) & (xs < w - pad)
        out = jnp.where(interior, out, 0.0)
    elif border != "replicate":
        raise ValueError(f"unknown border mode: {border}")
    return out.astype(mask.dtype)


def dilate(mask: Array, kernel_size: int = 5) -> Array:
    """Binary dilation with a square all-ones kernel (outside = 0)."""
    m = (mask > 0).astype(jnp.float32)
    out = _window(m, kernel_size, jax.lax.max, jnp.float32(0.0))
    return out.astype(mask.dtype)


def opening(mask: Array, kernel_size: int = 3) -> Array:
    """Morphological opening (erode then dilate), as cv2.MORPH_OPEN."""
    return dilate(erode(mask, kernel_size, border="replicate"), kernel_size)
