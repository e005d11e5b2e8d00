"""Fused multi-head attention as a Pallas TPU kernel.

The ViT's attention over ~905 patch tokens is small enough that K/V for one
(batch, head) fit comfortably in VMEM (1024x64 f32 = 256 KB each), so instead
of a streaming flash-attention loop the kernel fuses
logits -> masked softmax -> value matmul in one VMEM-resident pass per query
tile: two MXU matmuls with no HBM round-trip for the logits. Sequence lengths
are padded to the 128-lane tile and padded keys are masked with -inf.

Used by models/dinov2.py when `use_pallas_attention` is enabled; falls back to
jax.nn.dot_product_attention elsewhere (CPU tests run the kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [BLK_Q, Dh]
    k = k_ref[0].astype(jnp.float32)  # [T_pad, Dh]
    v = v_ref[0].astype(jnp.float32)  # [T_pad, Dh]

    logits = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, T_pad]

    t_pad = logits.shape[-1]
    if t_pad != seq_len:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(key_ids < seq_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    weights = p / denom

    out = jax.lax.dot_general(
        weights,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention(
    q: Array, k: Array, v: Array, block_q: int = 256, interpret: bool = False
) -> Array:
    """Multi-head attention: q,k,v [B, T, H, Dh] -> [B, T, H, Dh].

    Matches jax.nn.dot_product_attention (scale = Dh^-0.5, no mask beyond
    padding). T is padded internally to a multiple of 128.
    """
    b, t, h, dh = q.shape
    scale = dh ** -0.5
    t_pad = _round_up(t, 128)
    block_q = min(block_q, t_pad)

    def to_bht(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, dh)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qb, kb, vb = to_bht(q), to_bht(k), to_bht(v)

    grid = (b * h, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, seq_len=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :t].reshape(b, h, t, dh)
    return jnp.transpose(out, (0, 2, 1, 3))
