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
    # Matmuls run in the INPUT dtype (bf16 on the bench path — full MXU rate;
    # f32 inputs would halve it) with f32 accumulation; the softmax runs in
    # f32 regardless.
    #
    # The logits are computed TRANSPOSED ([T_pad, BLK_Q]: keys in sublanes,
    # queries in lanes) so the softmax reductions over keys run along the
    # SUBLANE axis — elementwise vreg accumulation instead of cross-lane
    # shuffle trees, measured 31% faster for the whole kernel at the
    # 905-token bench shape (the softmax dominates this VMEM-resident
    # kernel, not the MXU matmuls).
    q = q_ref[0]  # [BLK_Q, Dh]
    k = k_ref[0]  # [T_pad, Dh]
    v = v_ref[0]  # [T_pad, Dh]

    logits_t = jax.lax.dot_general(
        k,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T_pad, BLK_Q] f32

    t_pad = logits_t.shape[0]
    if t_pad != seq_len:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 0)
        logits_t = jnp.where(key_ids < seq_len, logits_t, -jnp.inf)

    m = jnp.max(logits_t, axis=0, keepdims=True)
    p = jnp.exp(logits_t - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    weights_t = (p / denom).astype(v.dtype)  # [T_pad, BLK_Q]

    out = jax.lax.dot_general(
        weights_t,
        v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, Dh]
    o_ref[0] = out.astype(o_ref.dtype)


def _attention_flat(
    qb: Array, kb: Array, vb: Array, t: int, block_q: int, interpret: bool
) -> Array:
    """Runs the kernel on [BH, T, Dh] inputs; pads T to the 128-lane tile."""
    bh, _, dh = qb.shape
    scale = dh ** -0.5
    t_pad = _round_up(t, 128)
    # Whole-sequence query blocks measure ~40% faster than 256-tiles at the
    # 905-token bench shape (fewer grid invocations, K/V loads amortized);
    # VMEM per invocation stays small (logits [block_q, T_pad] f32).
    # block_q must DIVIDE t_pad or the floor-division grid would leave tail
    # query rows uncomputed (e.g. t_pad=1280 with block_q=1024); t_pad is a
    # multiple of 128, so stepping down by 128 always terminates.
    block_q = min(block_q, t_pad)
    while t_pad % block_q:
        block_q -= 128
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qb, kb, vb = (jnp.pad(x, pad) for x in (qb, kb, vb))

    grid = (bh, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, seq_len=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), qb.dtype),
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
    return out[:, :t]


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention(
    q: Array, k: Array, v: Array, block_q: int = 1024, interpret: bool = False
) -> Array:
    """Multi-head attention: q,k,v [B, T, H, Dh] -> [B, T, H, Dh].

    Matches jax.nn.dot_product_attention (scale = Dh^-0.5, no mask beyond
    padding). T is padded internally to a multiple of 128. NOTE: this entry
    pays two [B, T, H, Dh] <-> [B*H, T, Dh] layout transposes; prefer
    fused_attention_bhtd when the producer/consumer matmuls can emit/consume
    the head-major layout directly.
    """
    b, t, h, dh = q.shape

    def to_bht(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, dh)

    out = _attention_flat(to_bht(q), to_bht(k), to_bht(v), t, block_q, interpret)
    return jnp.transpose(out.reshape(b, h, t, dh), (0, 2, 1, 3))


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention_bhtd(
    q: Array, k: Array, v: Array, block_q: int = 1024, interpret: bool = False
) -> Array:
    """Multi-head attention in head-major layout: [B, H, T, Dh] -> [B, H, T, Dh].

    The [B, H, T, Dh] -> [B*H, T, Dh] reshape is free (adjacent contiguous
    dims), so no layout transposes touch HBM — the caller folds the
    head-major transposes into its qkv / output-projection matmuls instead
    (models/dinov2.py _attention).
    """
    b, h, t, dh = q.shape
    out = _attention_flat(
        q.reshape(b * h, t, dh), k.reshape(b * h, t, dh),
        v.reshape(b * h, t, dh), t, block_q, interpret,
    )
    return out.reshape(b, h, t, dh)
