"""Fully-fused ViT transformer block as a single Pallas TPU kernel.

One kernel invocation processes one image's whole token sequence through an
entire pre-norm block — LN1 -> qkv -> per-head attention -> projection ->
layer-scaled residual -> LN2 -> MLP -> layer-scaled residual — with the
activations AND the block's weights resident in VMEM. The XLA graph for the
same block makes ~15 HBM round trips per layer for intermediates (qkv, per
-head attention inputs/outputs, MLP hidden); here only x enters and leaves.

Design notes:
- Grid is (B,): the caller pads the token count once to the SUBLANE tile (a
  multiple of 16, covering bf16 and f32 — tokens ride the sublane axis
  everywhere except the logits' query dim, so 905 tokens pad to 912, not
  1024); padded QUERY rows produce garbage that stays in padded rows (LN
  and the MLP are per-token), and padded KEYS are masked with -inf inside
  the attention, so the final slice back to the true sequence length is
  exact.
- The softmax uses the transposed (keys-in-sublanes) layout; see
  ops/attention.py for the measurement that motivates it.
- All matmuls run in the input dtype (bf16 on the inference path) with f32
  accumulation; LayerNorm statistics and softmax run in f32.
- Enabled with DinoV2Config.use_fused_block; numerically equivalent to the
  unfused path at bf16 tolerance (tests/test_vit_block.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shared with the unfused path so the two can never drift numerically
# (pure jnp; safe inside a Pallas kernel body). models/dinov2 only imports
# this module lazily, so there is no import cycle.
from foundpose_tpu.models.dinov2 import _layer_norm as _ln

Array = jax.Array

# Upper bound on the scoped-VMEM limit the fused-block kernel may request
# (v5e/v5p/v6e have 128 MB of VMEM; XLA's 16 MB default is just a
# conservative scoped cap). 100 MB leaves room for the pipeline's
# double-buffered in/out token blocks.
VMEM_LIMIT_BYTES = 100 * 2**20


def fused_block_vmem_bytes(
    t_pad: int,
    embed_dim: int,
    mlp_hidden: int,
    itemsize: int,
    swiglu: bool = False,
    mlp_chunks: int = 1,
    images_per_step: int = 1,
    paired_heads: bool = False,
) -> int:
    """Margined scoped-VMEM request for ONE fused-block invocation.

    Single source of truth for both the kernel's scoped-VMEM request below
    and models/dinov2._run_blocks' fits-or-fallback guard (via
    choose_mlp_chunks) — the two MUST agree or the guard silently diverges
    from what the kernel asks Mosaic for.

    Terms: layer weights (qkv/proj + the MLP's 2 matrices, 3·d·h total for
    SwiGLU's w12[d,2h]+w3[h,d] vs 2·d·h for fc1+fc2), token activations
    (x, qkv=3d, attn=d), the MLP hidden activations for ONE token chunk
    (t_pad/mlp_chunks rows — the kernel tiles the MLP over token chunks so
    wide-hidden variants like ViT-G fit), and one head's f32 logits (+ its
    exp temporary, covered by the margin).

    The margin is STRUCTURED: 1.5x on the dynamic terms (activations,
    logits, matmul staging — where Mosaic's stack allocation overshoots),
    1.0x on the weight blocks (loaded once per grid; grid-invariant index
    maps are not double-buffered). This model reproduces the bf16 ViT-S
    measurement exactly (Mosaic allocated ~1.4x the unmargined total =
    weights x1.0 + dynamics x1.5) and is validated on-device for ViT-G
    (weights 56.6 MB; a flat 1.5x would misreport it as not fitting).
    """
    d, hidden = embed_dim, mlp_hidden
    rows = images_per_step * t_pad
    chunk = rows // mlp_chunks
    mlp_weights = (3 if swiglu else 2) * d * hidden
    # Hidden activations live per chunk: fc1/w12 output (2h for SwiGLU's
    # gate+value, h otherwise) + the activated h.
    mlp_act = chunk * ((3 if swiglu else 2) * hidden)
    weights = itemsize * (4 * d * d + mlp_weights)  # qkv/proj/mlp weights
    dynamic = (
        itemsize * rows * 5 * d                # x, qkv(3d), attn(d)
        + itemsize * mlp_act
        # f32 logits scratch: one head's [T, T], or a head pair's [T, 2T].
        + 4 * t_pad * t_pad * (2 if paired_heads else 1)
    )
    return weights + int(dynamic * 1.5)


def choose_mlp_chunks(
    t_pad: int, embed_dim: int, mlp_hidden: int, itemsize: int, swiglu: bool,
    images_per_step: int = 1,
    paired_heads: bool = False,
):
    """Smallest MLP token-chunk count whose margined footprint fits the VMEM
    budget.

    Chunk counts must divide t_pad into sublane-aligned (multiple-of-16)
    chunks. Returns the chunk count, or None when even the finest chunking
    does not fit (caller falls back to the unfused path).
    """
    candidates = [
        c for c in range(1, t_pad // 16 + 1)
        if t_pad % c == 0 and (t_pad // c) % 16 == 0
    ]
    for c in candidates:
        est = fused_block_vmem_bytes(
            t_pad, embed_dim, mlp_hidden, itemsize, swiglu=swiglu,
            mlp_chunks=c, images_per_step=images_per_step,
            paired_heads=paired_heads,
        )
        if est < VMEM_LIMIT_BYTES:
            return c
    return None


def _block_kernel(
    x_ref,
    n1s_ref, n1b_ref, qkvw_ref, qkvb_ref, projw_ref, projb_ref, ls1_ref,
    n2s_ref, n2b_ref, fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, ls2_ref,
    o_ref,
    *,
    seq_len: int,
    num_heads: int,
    head_dim: int,
    eps: float,
    approx_gelu: bool,
    softmax_stabilizer: str,
    swiglu: bool = False,
    mlp_chunks: int = 1,
    images_per_step: int = 1,
    paired_heads: bool = False,
):
    g = images_per_step
    t_pad = x_ref.shape[1]
    d = x_ref.shape[-1]
    # Per-token sublayers (LN, qkv, proj, MLP) treat the g images of this
    # grid step as ONE [g*T_pad, D] token matrix — larger matmul M amortizes
    # MXU streaming and halves the grid-step count; only the attention
    # matrices are inherently per-image.
    x = x_ref[...].reshape(g * t_pad, d)
    # exp -> exp2 conversion folded into the attention scale, and the scale
    # folded into q itself: one [T, D] multiply replaces a per-head
    # [T, T] logits multiply and the multiply inside every exp lowering.
    scale = head_dim ** -0.5 * 1.4426950408889634  # 1/sqrt(hd) * log2(e)

    # ---- attention sublayer -------------------------------------------------
    xn = _ln(x, n1s_ref[...], n1b_ref[...], eps)
    qkv = (
        jax.lax.dot(xn, qkvw_ref[...], preferred_element_type=jnp.float32)
        + qkvb_ref[...].astype(jnp.float32)
    )  # [g*T_pad, 3D] f32
    q_all = (qkv[:, :d] * scale).astype(x.dtype)
    kv = qkv[:, d:].astype(x.dtype)

    # Padded-key mask as an additive [T_pad, 1] bias column, computed once
    # per kernel (not iota+compare+select per head): exp2(-inf - m) == 0, so
    # padded keys drop out of both the matmul and the normalizer.
    kmask = None
    if t_pad != seq_len:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        kmask = jnp.where(key_ids < seq_len, 0.0, -jnp.inf).astype(jnp.float32)

    def _weights(logits_t):
        """Un-normalized softmax weights over the key (sublane) axis."""
        if kmask is not None:
            logits_t = logits_t + kmask
        if softmax_stabilizer == "capped":
            # No max reduction (the 6 per-head max passes cost 0.73
            # ms/layer at batch 64 — 28% of the whole block): p is capped
            # against f32 overflow and the sum floored against 0/0 on
            # all-underflow columns. Numerically equivalent to the
            # stabilized softmax within f32 rounding while logits < ~99
            # (exp2(l) vs exp2(l-m) round differently; parity holds at
            # atol 2e-5 — DINOv2's run within +-30); beyond that it
            # degrades to uniform over capped entries, and an
            # all-underflow column yields ZERO output rather than the
            # uniform average true softmax would give.
            return jnp.minimum(jnp.exp2(logits_t), 1e30)
        if softmax_stabilizer == "linear":
            # MEASUREMENT ONLY (not a softmax): skips the exp pass to
            # isolate the VPU transcendental cost in kernel profiling
            # (docs/KERNELS.md); never used by the pipelines.
            return logits_t
        m = jnp.max(logits_t, axis=0, keepdims=True)
        return jnp.exp2(logits_t - m)

    # Ones column appended to each head's v: the softmax normalizer (the
    # column sum of p) rides the SAME MXU matmul as the attention output —
    # the head_dim-64 output occupies half the 128-lane tile anyway, so slot
    # 64 is free — deleting a [T, T] VPU sum reduction per head (the same
    # class of reduction whose removal as the max pass bought 0.73 ms/layer).
    ones_col = jnp.ones((t_pad, 1), kv.dtype)
    hd = head_dim
    pair = paired_heads and num_heads % 2 == 0 and 2 * hd <= 128
    img_outs = []
    for im in range(g):
        rows = slice(im * t_pad, (im + 1) * t_pad)
        head_outs = []
        if pair:
            # Head-PAIRED logits: a head_dim-64 contraction streams the
            # 128-deep MXU at 50% occupancy, but heads are independent, so
            # two heads' logits ride ONE [T,128]x[128,2T] matmul — k2 holds
            # both heads' keys side by side (full contraction depth) and q2
            # is block-diagonal ([[q0,0],[0,q1]]), so the cross-head terms
            # vanish: columns 0:T are head h0's logits, T:2T head h1's.
            # Same FLOPs as the two per-head matmuls, twice the MXU rate;
            # the zero-padding build is a cheap VPU copy.
            zeros_q = jnp.zeros((t_pad, hd), x.dtype)
            for hp in range(num_heads // 2):
                h0 = 2 * hp
                q0 = q_all[rows, h0 * hd : (h0 + 1) * hd]
                q1 = q_all[rows, (h0 + 1) * hd : (h0 + 2) * hd]
                k2 = kv[rows, h0 * hd : (h0 + 2) * hd]          # [T, 2hd]
                q2 = jnp.concatenate(
                    [jnp.concatenate([q0, zeros_q], axis=1),
                     jnp.concatenate([zeros_q, q1], axis=1)], axis=0
                )                                               # [2T, 2hd]
                logits2 = jax.lax.dot_general(
                    k2, q2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T_pad(keys), 2T_pad(h0 queries | h1 queries)]
                p2 = _weights(logits2)
                # Both heads' v side by side + the normalizer ones column:
                # one output matmul serves both heads (rows 0:T use cols
                # 0:hd with head h0's weights, rows T:2T cols hd:2hd).
                v2 = jnp.concatenate(
                    [kv[rows, d + h0 * hd : d + (h0 + 2) * hd], ones_col],
                    axis=1,
                )                                               # [T, 2hd+1]
                o2 = jax.lax.dot_general(
                    p2.astype(x.dtype), v2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [2T, 2hd+1]: un-normalized outputs | row sums
                s0 = jnp.maximum(o2[:t_pad, 2 * hd :], 1e-30)
                s1 = jnp.maximum(o2[t_pad:, 2 * hd :], 1e-30)
                head_outs.append(
                    (o2[:t_pad, :hd] * (1.0 / s0)).astype(x.dtype)
                )
                head_outs.append(
                    (o2[t_pad:, hd : 2 * hd] * (1.0 / s1)).astype(x.dtype)
                )
        else:
            for h in range(num_heads):
                q = q_all[rows, h * hd : (h + 1) * hd]
                k = kv[rows, h * hd : (h + 1) * hd]
                v = kv[rows, d + h * hd : d + (h + 1) * hd]
                # Transposed logits: softmax over keys reduces along
                # sublanes.
                logits_t = jax.lax.dot_general(
                    k, q, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T_pad(keys), T_pad(queries)], pre-scaled via q
                p = _weights(logits_t)
                v_aug = jnp.concatenate([v, ones_col], axis=1)  # [T, hd+1]
                o_aug = jax.lax.dot_general(
                    p.astype(v.dtype), v_aug, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T_pad(queries), hd+1] f32: un-normalized out | row sums
                # Late normalization: one [T, head_dim] multiply by the
                # reciprocal row-sum instead of a [T, T] divide on the
                # weights. The sum floor only guards 0/0 on fully-
                # underflowed columns (capped path).
                s = jnp.maximum(o_aug[:, hd:], 1e-30)
                head_outs.append(
                    (o_aug[:, :hd] * (1.0 / s)).astype(x.dtype)
                )
        img_outs.append(jnp.concatenate(head_outs, axis=-1))  # [T_pad, D]
    attn = (
        jnp.concatenate(img_outs, axis=0) if g > 1 else img_outs[0]
    )  # [g*T_pad, D]
    y = (
        jax.lax.dot(attn, projw_ref[...], preferred_element_type=jnp.float32)
        + projb_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    x = x + ls1_ref[...].astype(x.dtype) * y

    # ---- MLP sublayer -------------------------------------------------------
    # Token-chunked (static unrolled slices) so the [chunk, hidden]
    # activations — the largest per-token intermediate for wide-hidden
    # variants like ViT-G's 4096 SwiGLU — never all live at once;
    # choose_mlp_chunks picks the coarsest chunking that fits VMEM.
    # For SwiGLU models the fc1/fc2 ref slots hold w12 [D, 2H] / w3 [H, D].
    xn2 = _ln(x, n2s_ref[...], n2b_ref[...], eps)
    hidden = fc2w_ref.shape[0]
    chunk = (g * t_pad) // mlp_chunks
    y2_chunks = []
    for ci in range(mlp_chunks):
        xc = xn2[ci * chunk : (ci + 1) * chunk]
        h1 = (
            jax.lax.dot(xc, fc1w_ref[...], preferred_element_type=jnp.float32)
            + fc1b_ref[...].astype(jnp.float32)
        )
        if swiglu:
            # DINOv2 SwiGLUFFNFused: silu(x @ w1) * (x @ w2), with w1/w2
            # fused column-wise into w12 (reference: dinov2's SwiGLUFFNFused).
            h1 = (jax.nn.silu(h1[:, :hidden]) * h1[:, hidden:]).astype(x.dtype)
        else:
            h1 = jax.nn.gelu(h1, approximate=approx_gelu).astype(x.dtype)
        y2_chunks.append(
            (
                jax.lax.dot(
                    h1, fc2w_ref[...], preferred_element_type=jnp.float32
                )
                + fc2b_ref[...].astype(jnp.float32)
            ).astype(x.dtype)
        )
    y2 = jnp.concatenate(y2_chunks, axis=0) if mlp_chunks > 1 else y2_chunks[0]
    out = x + ls2_ref[...].astype(x.dtype) * y2
    o_ref[...] = out.reshape(g, t_pad, d)


def fused_vit_block(
    x: Array,
    p: Dict[str, Array],
    seq_len: int,
    num_heads: int,
    head_dim: int,
    eps: float = 1e-6,
    approx_gelu: bool = False,
    softmax_stabilizer: str = "column",
    images_per_step: int = 1,
    paired_heads: bool = False,
    interpret: bool = False,
) -> Array:
    """One transformer block over [B, T_pad, D] tokens (T_pad a multiple of
    the 16-row sublane tile; rows >= seq_len are padding). `p` holds one
    layer's (unstacked) parameters in the models/dinov2.py naming — either
    the fc1/fc2 GELU MLP or the w12/w3 SwiGLU MLP (ViT-G).

    images_per_step: images per kernel invocation (grid = B/g): the
    per-token matmuls run on [g*T_pad, D] matrices (fewer grid steps,
    longer MXU streams); attention stays per-image. Requires B % g == 0;
    dynamic VMEM scales with g (the guard accounts for it).

    paired_heads: compute two heads' attention per matmul pair (see the
    kernel comment); applies when num_heads is even and head_dim <= 64,
    silently ignored otherwise.

    This wrapper derives the MLP chunking and the scoped-VMEM request from
    the mutable `VMEM_LIMIT_BYTES` OUTSIDE the jit boundary (shape-only
    math, so it also runs fine under an outer trace) and passes both as
    static arguments — reading the global inside the jitted body would bake
    the value at first trace and silently ignore later mutations (the
    chunked-parity tests mutate it)."""
    b, t_pad, d = x.shape
    g = images_per_step
    if b % g != 0:
        raise ValueError(f"batch {b} not divisible by images_per_step={g}")
    swiglu = "w12_kernel" in p
    hidden = p["w3_kernel"].shape[0] if swiglu else p["fc1_kernel"].shape[-1]

    # Request a scoped-VMEM limit sized to this block's actual footprint
    # instead of XLA's conservative 16 MB default (the chip has 128 MB):
    # bf16 ViT-S needs ~16.3 MB, ViT-B/L substantially more. The request is
    # kept snug (analytic estimate x1.5) rather than maximal — granting more
    # than needed gives Mosaic no benefit. models/dinov2._run_blocks guards
    # the SAME estimator (fused_block_vmem_bytes via choose_mlp_chunks)
    # against VMEM_LIMIT_BYTES before choosing this path.
    esize = jnp.dtype(x.dtype).itemsize
    mlp_chunks = choose_mlp_chunks(
        t_pad, d, hidden, esize, swiglu, images_per_step=g,
        paired_heads=paired_heads,
    )
    if mlp_chunks is None:
        raise ValueError(
            "fused_vit_block does not fit VMEM even with per-16-token MLP "
            "chunking; the caller should have taken the unfused path "
            f"(t_pad={t_pad}, d={d}, hidden={hidden}, swiglu={swiglu}, g={g})"
        )
    est = fused_block_vmem_bytes(
        t_pad, d, hidden, esize, swiglu=swiglu, mlp_chunks=mlp_chunks,
        images_per_step=g, paired_heads=paired_heads,
    )
    vmem_limit = min(VMEM_LIMIT_BYTES, max(est, 16 * 2**20))
    return _fused_vit_block_impl(
        x, p, seq_len=seq_len, num_heads=num_heads, head_dim=head_dim,
        eps=eps, approx_gelu=approx_gelu,
        softmax_stabilizer=softmax_stabilizer, images_per_step=g,
        paired_heads=paired_heads, mlp_chunks=mlp_chunks,
        vmem_limit=vmem_limit, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("seq_len", "num_heads", "head_dim", "eps", "approx_gelu",
                     "softmax_stabilizer", "images_per_step", "paired_heads",
                     "mlp_chunks", "vmem_limit", "interpret"),
)
def _fused_vit_block_impl(
    x: Array,
    p: Dict[str, Array],
    seq_len: int,
    num_heads: int,
    head_dim: int,
    eps: float,
    approx_gelu: bool,
    softmax_stabilizer: str,
    images_per_step: int,
    paired_heads: bool,
    mlp_chunks: int,
    vmem_limit: int,
    interpret: bool,
) -> Array:
    b, t_pad, d = x.shape
    g = images_per_step
    swiglu = "w12_kernel" in p
    if swiglu:
        mlp_w1, mlp_b1 = p["w12_kernel"], p["w12_bias"]
        mlp_w2, mlp_b2 = p["w3_kernel"], p["w3_bias"]
        hidden = mlp_w2.shape[0]
    else:
        mlp_w1, mlp_b1 = p["fc1_kernel"], p["fc1_bias"]
        mlp_w2, mlp_b2 = p["fc2_kernel"], p["fc2_bias"]
        hidden = mlp_w1.shape[-1]

    rep = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    w1_cols = 2 * hidden if swiglu else hidden
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, seq_len=seq_len, num_heads=num_heads,
            head_dim=head_dim, eps=eps, approx_gelu=approx_gelu,
            softmax_stabilizer=softmax_stabilizer, swiglu=swiglu,
            mlp_chunks=mlp_chunks, images_per_step=g,
            paired_heads=paired_heads,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), x.dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((d,)), rep((d,)),                 # norm1 scale/bias
            rep((d, 3 * d)), rep((3 * d,)),       # qkv
            rep((d, d)), rep((d,)),               # proj
            rep((d,)),                            # ls1
            rep((d,)), rep((d,)),                 # norm2 scale/bias
            rep((d, w1_cols)), rep((w1_cols,)),   # fc1 | w12
            rep((hidden, d)), rep((d,)),          # fc2 | w3
            rep((d,)),                            # ls2
        ],
        out_specs=pl.BlockSpec((g, t_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(
        x,
        p["norm1_scale"], p["norm1_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"], p["ls1"],
        p["norm2_scale"], p["norm2_bias"], mlp_w1, mlp_b1,
        mlp_w2, mlp_b2, p["ls2"],
    )
    return out
