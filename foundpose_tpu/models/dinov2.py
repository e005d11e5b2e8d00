"""Functional JAX DINOv2 ViT with intermediate-facet extraction.

TPU-native replacement for the reference's hook-based torch extractor
(reference: utils/dinov2_utils.py:25-389). Key design departures:

- No forward hooks: the forward runs exactly `layer+1` blocks via `lax.scan`
  over stacked block parameters and returns the requested facet directly.
  Blocks are a single stacked pytree, so compile time is O(1) in depth and the
  whole extractor is one fused XLA program.
- Batched NHWC crops in, patch-token feature maps out; everything is
  jit/vmap/pjit-compatible, bf16-friendly (params f32, compute dtype
  selectable).
- Stride override is expressed as patch-embed stride + bicubic pos-embed
  resize (reference: utils/dinov2_utils.py:313-389) without monkey-patching.

Model-name DSL parsing matches the reference
("dinov2_version=vits14-reg_stride=14_facet=token_layer=9_...norm=1",
reference: utils/dinov2_utils.py:59-78).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Architecture table for the public DINOv2 releases.
_VARIANTS = {
    "vits14": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0, swiglu=False),
    "vitb14": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0, swiglu=False),
    "vitl14": dict(embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0, swiglu=False),
    "vitg14": dict(embed_dim=1536, depth=40, num_heads=24, mlp_ratio=4.0, swiglu=True),
}


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    variant: str = "vits14"
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    swiglu: bool = False
    patch_size: int = 14
    num_register_tokens: int = 4
    pos_grid: int = 37  # DINOv2 is pretrained at 518px -> 37x37 patch grid.
    layer_norm_eps: float = 1e-6
    # Extraction options (reference DSL defaults, utils/dinov2_utils.py:52-57).
    stride: int = 14
    facet: str = "token"
    layer: int = 9
    apply_norm: bool = True
    # Attention backend: Pallas fused kernel on TPU, XLA SDPA elsewhere.
    use_pallas_attention: bool = False
    # tanh-approximated GELU instead of the exact erf GELU the reference
    # model uses. Max |exact - tanh| is 5e-4 (at |x|~2), below bf16
    # activation noise in practice but NOT bit-faithful — off by default;
    # the bench enables it (erf between the MLP matmuls costs ~1 ms/layer
    # at the bench shapes on v5e).
    approx_gelu: bool = False
    # Whole transformer block as ONE Pallas kernel (ops/vit_block.py):
    # activations + the layer's weights stay VMEM-resident through
    # LN1->qkv->attention->proj->LN2->MLP, eliminating the unfused path's
    # ~15 HBM round trips per layer. Not supported for SwiGLU (ViT-G).
    use_fused_block: bool = False
    # Softmax stabilizer inside the fused block. "column" = per-query max
    # subtraction (exact, default). "capped" drops the max reduction —
    # the 6 per-head max passes cost 0.73 ms/layer at batch 64 on v5e,
    # 28% of the whole block — and instead caps p = min(exp2(l), 1e30)
    # with a sum floor: numerically equivalent to the stabilized softmax
    # within f32 rounding while logits < ~99 (exp2(l) and exp2(l-m) round
    # differently; the parity test needs atol 2e-5 — DINOv2 attention
    # logits run within +-30 empirically), overflow-safe via the cap
    # beyond that. An all-underflow query column yields ZERO attention
    # output (not the uniform average true softmax would give) — the sum
    # floor only prevents 0/0. The bench enables it; parity-tested
    # against the unfused path.
    softmax_stabilizer: str = "column"
    # Images per fused-block kernel invocation (grid = B/g): per-token
    # matmuls run on [g*T_pad, D] matrices. Applied only when the batch is
    # divisible by g and the enlarged dynamic footprint still fits VMEM;
    # falls back to 1 otherwise.
    fused_images_per_step: int = 1
    # Two heads' attention per matmul pair in the fused block (full
    # 128-deep MXU contraction for head_dim-64 models; ops/vit_block.py).
    # Applies when num_heads is even and head_dim <= 64.
    fused_paired_heads: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        if self.swiglu:
            # DINOv2's fused SwiGLU hidden size, rounded to a multiple of 8.
            return (int(self.embed_dim * self.mlp_ratio * 2 / 3) + 7) // 8 * 8
        return int(self.embed_dim * self.mlp_ratio)


# DSL keys the reference's parser accepts but that have no effect on the
# extractor (log-binning was never wired up there either) — accepted for
# config compatibility, ignored here (reference: utils/dinov2_utils.py:59-78).
_IGNORED_DSL_KEYS = frozenset({"logbin"})


def parse_model_name(model_name: str) -> DinoV2Config:
    """Parses the reference's model-name DSL into a config.

    Supports "dinov2_<version>" and
    "dinov2_version=<v>_stride=<s>_facet=<f>_layer=<l>_norm=<0|1>".
    Unknown keys raise (a typo like "layr=19" must not silently run the
    defaults); `logbin` is whitelisted as known-ignorable.
    (reference: utils/dinov2_utils.py:59-78)
    """
    items = model_name.split("_")
    if items[0] != "dinov2":
        raise ValueError(f"not a dinov2 model name: {model_name}")
    version, stride, facet, layer, norm = "vits14-reg", 14, "token", 9, True
    if len(items) == 2 and "=" not in items[1]:
        version = items[1]
    else:
        for item in items[1:]:
            if "=" not in item:
                raise ValueError(
                    f"malformed dinov2 model-name item {item!r} in "
                    f"{model_name!r} (expected key=value)"
                )
            k, v = item.split("=", 1)
            if k == "version":
                version = v
            elif k == "stride":
                stride = int(v)
            elif k == "facet":
                if v not in ("token", "query", "key", "value", "attn"):
                    raise ValueError(
                        f"unknown dinov2 facet {v!r} in {model_name!r} "
                        "(known: token/query/key/value/attn)"
                    )
                facet = v
            elif k == "layer":
                layer = int(v)
            elif k == "norm":
                norm = bool(int(v))
            elif k not in _IGNORED_DSL_KEYS:
                raise ValueError(
                    f"unknown dinov2 model-name key {k!r} in {model_name!r} "
                    f"(known: version/stride/facet/layer/norm; ignorable: "
                    f"{sorted(_IGNORED_DSL_KEYS)})"
                )
    has_reg = version.endswith("-reg")
    base = version[:-4] if has_reg else version
    if base not in _VARIANTS:
        raise ValueError(f"unknown dinov2 variant: {version}")
    spec = _VARIANTS[base]
    return DinoV2Config(
        variant=base,
        num_register_tokens=4 if has_reg else 0,
        stride=stride,
        facet=facet,
        layer=layer,
        apply_norm=norm,
        **spec,
    )


def resolve_config(
    model_name: str,
    use_pallas_attention: bool = False,
    use_fused_block: bool = False,
    approx_gelu: bool = False,
    overrides: Optional[Dict[str, Any]] = None,
) -> DinoV2Config:
    """parse_model_name + the CLIs' fast-path flags + explicit overrides.

    `overrides` is the pipelines' injection seam (`vit_overrides` on
    InferOpts/GenRepreOpts): a dict of DinoV2Config field replacements —
    e.g. {"embed_dim": 32, "depth": 2} for tiny test models, or
    {"softmax_stabilizer": "capped"} for kernel experiments — applied LAST,
    so tests and sweeps never have to monkey-patch module globals.
    """
    cfg = dataclasses.replace(
        parse_model_name(model_name),
        use_pallas_attention=use_pallas_attention,
        use_fused_block=use_fused_block,
        approx_gelu=approx_gelu,
    )
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_params(key: Array, cfg: DinoV2Config, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init parameter pytree (blocks stacked along a leading depth axis)."""
    d, h = cfg.embed_dim, cfg.mlp_hidden
    n_pos = 1 + cfg.pos_grid * cfg.pos_grid
    keys = jax.random.split(key, 16)

    def trunc(k, shape, std=0.02):
        return (std * jax.random.truncated_normal(k, -2.0, 2.0, shape)).astype(dtype)

    def block_params(k):
        ks = jax.random.split(k, 8)
        p = {
            "norm1_scale": jnp.ones((d,), dtype),
            "norm1_bias": jnp.zeros((d,), dtype),
            "qkv_kernel": trunc(ks[0], (d, 3 * d)),
            "qkv_bias": jnp.zeros((3 * d,), dtype),
            "proj_kernel": trunc(ks[1], (d, d)),
            "proj_bias": jnp.zeros((d,), dtype),
            "ls1": jnp.full((d,), 1e-5, dtype),
            "norm2_scale": jnp.ones((d,), dtype),
            "norm2_bias": jnp.zeros((d,), dtype),
            "ls2": jnp.full((d,), 1e-5, dtype),
        }
        if cfg.swiglu:
            p.update(
                w12_kernel=trunc(ks[2], (d, 2 * h)),
                w12_bias=jnp.zeros((2 * h,), dtype),
                w3_kernel=trunc(ks[3], (h, d)),
                w3_bias=jnp.zeros((d,), dtype),
            )
        else:
            p.update(
                fc1_kernel=trunc(ks[2], (d, h)),
                fc1_bias=jnp.zeros((h,), dtype),
                fc2_kernel=trunc(ks[3], (h, d)),
                fc2_bias=jnp.zeros((d,), dtype),
            )
        return p

    blocks = [block_params(k) for k in jax.random.split(keys[5], cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patch_kernel": trunc(keys[0], (cfg.patch_size, cfg.patch_size, 3, d)),
        "patch_bias": jnp.zeros((d,), dtype),
        "cls_token": trunc(keys[1], (1, 1, d)),
        "pos_embed": trunc(keys[2], (1, n_pos, d)),
        "blocks": stacked,
        "norm_scale": jnp.ones((d,), dtype),
        "norm_bias": jnp.zeros((d,), dtype),
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = trunc(keys[3], (1, cfg.num_register_tokens, d))
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    # Statistics in f32 for bf16 stability; output in the compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _attention(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    b, t, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    if cfg.use_pallas_attention:
        from foundpose_tpu.ops.attention import fused_attention_bhtd

        # Head-major path with zero explicit layout transposes: the
        # [B,T,D]->[B,H,T,Dh] transpose folds into the qkv matmul's output
        # and the head re-merge folds into the projection matmul's input
        # (XLA emits them as MXU epilogues, not separate HBM passes).
        w = p["qkv_kernel"].reshape(d, 3, nh, hd)
        bias = p["qkv_bias"].reshape(3, nh, hd)
        qkv = jnp.einsum("btd,dkhe->kbhte", x, w) + bias[:, None, :, None, :]
        out = fused_attention_bhtd(qkv[0], qkv[1], qkv[2])  # [B, H, T, Dh]
        wo = p["proj_kernel"].reshape(nh, hd, d)
        return jnp.einsum("bhte,hed->btd", out, wo) + p["proj_bias"]

    qkv = x @ p["qkv_kernel"] + p["qkv_bias"]  # [B, T, 3D]
    qkv = qkv.reshape(b, t, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, nh, hd]
    # jax's fused SDPA (maps to an efficient attention on TPU).
    out = jax.nn.dot_product_attention(q, k, v)
    out = out.reshape(b, t, d)
    return out @ p["proj_kernel"] + p["proj_bias"]


def _mlp(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    if cfg.swiglu:
        x12 = x @ p["w12_kernel"] + p["w12_bias"]
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return (jax.nn.silu(x1) * x2) @ p["w3_kernel"] + p["w3_bias"]
    h = jax.nn.gelu(
        x @ p["fc1_kernel"] + p["fc1_bias"], approximate=cfg.approx_gelu
    )
    return h @ p["fc2_kernel"] + p["fc2_bias"]


def _block(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    eps = cfg.layer_norm_eps
    x = x + p["ls1"] * _attention(_layer_norm(x, p["norm1_scale"], p["norm1_bias"], eps), p, cfg)
    x = x + p["ls2"] * _mlp(_layer_norm(x, p["norm2_scale"], p["norm2_bias"], eps), p, cfg)
    return x


def _torch_bicubic_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """Dense (out, in) interpolation matrix reproducing torch's
    F.interpolate(mode="bicubic", align_corners=False) with an explicit
    scale_factor (recompute_scale_factor=False): src = (dst + 0.5)/scale - 0.5,
    cubic kernel a = -0.75, border replication. Computed with numpy at trace
    time (sizes are static), applied as a tiny matmul.
    """
    a = -0.75

    def cubic(t):
        t = np.abs(t)
        w = np.where(
            t <= 1.0,
            (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
            np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
        )
        return w

    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) / scale - 0.5
        base = int(np.floor(src))
        for tap in range(-1, 3):
            j = base + tap
            w = cubic(src - j)
            m[i, min(max(j, 0), in_size - 1)] += w
    return m.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: Array, grid_hw: Tuple[int, int], pos_grid: int
) -> Array:
    """Bicubic resize of the patch position embeddings to a new grid.

    Bit-faithful to the reference's torch path including the +0.1
    anti-rounding offset in the scale factor
    (reference: utils/dinov2_utils.py:313-361).
    """
    gh, gw = grid_hw
    if (gh, gw) == (pos_grid, pos_grid):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    d = pos_embed.shape[-1]
    grid = patch_pos.reshape(1, pos_grid, pos_grid, d)
    # Reference uses scale_factor=(g + 0.1)/sqrt(N) per axis. Note the
    # reference computes (w0, h0) from (w, h) respectively but feeds
    # scale_factor=(w0_scale, h0_scale) to a (H, W)-ordered interpolate; for
    # the square inputs used throughout this is equivalent.
    mh = jnp.asarray(_torch_bicubic_matrix(pos_grid, gh, (gh + 0.1) / pos_grid))
    mw = jnp.asarray(_torch_bicubic_matrix(pos_grid, gw, (gw + 0.1) / pos_grid))
    resized = jnp.einsum(
        "oi,bijd->bojd", mh, grid, precision=jax.lax.Precision.HIGHEST
    )
    resized = jnp.einsum(
        "pj,bojd->bopd", mw, resized, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.concatenate([cls_pos, resized.reshape(1, gh * gw, d)], axis=1)


def embed_tokens(
    params: Dict[str, Any], cfg: DinoV2Config, images_nhwc: Array
) -> Tuple[Array, Tuple[int, int]]:
    """Patchify + cls + pos embed + register tokens.

    Register tokens are inserted after CLS and receive no position embedding,
    matching DINOv2. Returns (tokens [B, 1+R+N, D], patch grid (gh, gw)).
    """
    b, ih, iw, _ = images_nhwc.shape
    stride = cfg.stride
    gh = 1 + (ih - cfg.patch_size) // stride
    gw = 1 + (iw - cfg.patch_size) // stride
    x = jax.lax.conv_general_dilated(
        images_nhwc,
        params["patch_kernel"].astype(images_nhwc.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + params["patch_bias"].astype(x.dtype)
    x = x.reshape(b, gh * gw, cfg.embed_dim)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], (gh, gw), cfg.pos_grid)
    x = x + pos.astype(x.dtype)

    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            params["register_tokens"].astype(x.dtype),
            (b, cfg.num_register_tokens, cfg.embed_dim),
        )
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)
    return x, (gh, gw)


def _run_blocks(x: Array, blocks: Dict[str, Array], cfg: DinoV2Config, upto: int) -> Array:
    """Runs blocks [0, upto) via lax.scan over the stacked parameter pytree."""
    if upto == 0:
        return x
    sliced = jax.tree.map(lambda a: a[:upto].astype(x.dtype), blocks)

    b, t, d = x.shape
    use_fused = cfg.use_fused_block
    if use_fused:
        # The kernel requests a raised scoped-VMEM limit
        # (ops/vit_block.VMEM_LIMIT_BYTES, 100 MB of the chip's 128 MB),
        # which fits bf16 ViT-S/B/L at 905 tokens; guard with the kernel's
        # OWN chunk chooser (single-sourced over fused_block_vmem_bytes,
        # which applies the 1.5x margin — Mosaic's actual stack allocation
        # measured ~1.4x the estimate on bf16 ViT-S) and fall back to the
        # unfused path instead of OOMing at compile. Wide-hidden variants
        # (ViT-G's 4096-wide SwiGLU) are admitted by token-chunking the MLP
        # inside the kernel; choose_mlp_chunks returns None only when even
        # the finest chunking does not fit.
        from foundpose_tpu.ops.vit_block import choose_mlp_chunks

        # Tokens ride the SUBLANE axis everywhere except the logits' query
        # dim, so padding only needs the sublane tile (16 covers bf16 and
        # f32) — not the 128-lane tile. 905 tokens -> 912 instead of 1024:
        # ~11% less work in every per-token op of the block.
        t_pad = -(-t // 16) * 16
        esize = jnp.dtype(x.dtype).itemsize
        # Multi-image grid steps only when the batch divides and the
        # g-scaled dynamic footprint still fits; drop to g=1 otherwise.
        g = cfg.fused_images_per_step

        def _chunks(g_):
            return choose_mlp_chunks(
                t_pad, d, cfg.mlp_hidden, esize, cfg.swiglu,
                images_per_step=g_, paired_heads=cfg.fused_paired_heads,
            )

        chunks = _chunks(g) if b % g == 0 else None
        if chunks is None and g != 1:
            g = 1
            chunks = _chunks(g)
        use_fused = chunks is not None
    if use_fused:
        from foundpose_tpu.ops.vit_block import fused_vit_block

        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

        def body(h, p):
            return (
                fused_vit_block(
                    h, p, seq_len=t, num_heads=cfg.num_heads,
                    head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
                    approx_gelu=cfg.approx_gelu,
                    softmax_stabilizer=cfg.softmax_stabilizer,
                    images_per_step=g,
                    paired_heads=cfg.fused_paired_heads,
                ),
                None,
            )

        out, _ = jax.lax.scan(body, xp, sliced)
        return out[:, :t]

    def body(h, p):
        return _block(h, p, cfg), None

    out, _ = jax.lax.scan(body, x, sliced)
    return out


def extract_facet(
    params: Dict[str, Any], cfg: DinoV2Config, images_nhwc: Array
) -> Dict[str, Array]:
    """Runs the ViT up to `cfg.layer` and returns the requested facet.

    Facets (reference: utils/dinov2_utils.py:160-230):
      - "token": output of block `layer`.
      - "query"/"key"/"value": that projection of block `layer`'s attention,
        heads re-flattened in the reference's (head-minor) layout.

    Returns dict with:
      - "cls_tokens": [B, D'] CLS facet.
      - "feature_maps": [B, gh, gw, D'] patch facet map (register tokens
        dropped; final LayerNorm applied to CLS+patches if cfg.apply_norm,
        reference: utils/dinov2_utils.py:137-143).
    """
    x, (gh, gw) = embed_tokens(params, cfg, images_nhwc)
    blocks = params["blocks"]

    if cfg.facet == "token":
        x = _run_blocks(x, blocks, cfg, cfg.layer + 1)
        feats = x
    elif cfg.facet in ("query", "key", "value"):
        x = _run_blocks(x, blocks, cfg, cfg.layer)
        p = jax.tree.map(lambda a: a[cfg.layer].astype(x.dtype), blocks)
        xn = _layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
        qkv = xn @ p["qkv_kernel"] + p["qkv_bias"]
        b, t, _ = qkv.shape
        qkv = qkv.reshape(b, t, 3, cfg.num_heads, cfg.head_dim)
        idx = {"query": 0, "key": 1, "value": 2}[cfg.facet]
        sel = qkv[:, :, idx]  # [B, T, nh, hd]
        # Reference layout: (B, h, t, d) -> permute(0,2,3,1) -> flatten(d, h).
        feats = jnp.transpose(sel, (0, 1, 3, 2)).reshape(b, t, cfg.embed_dim)
    elif cfg.facet == "attn":
        # The reference rejects "attn" on its descriptor path with the same
        # contract: extract_descriptors asserts facet in {key,query,value,
        # token} (reference: utils/dinov2_utils.py:281-286); "attn" is only
        # reachable at the raw feature level (_extract_features, which
        # returns Bxhxtxt attention maps). Use extract_attention_maps.
        raise ValueError(
            "facet='attn' is not a descriptor facet (the reference's "
            "extract_descriptors rejects it too); use "
            "dinov2.extract_attention_maps for the Bxhxtxt attention maps"
        )
    else:
        raise ValueError(f"unsupported facet: {cfg.facet}")

    cls_tokens = feats[:, 0]
    patch_tokens = feats[:, 1 + cfg.num_register_tokens :]

    if cfg.apply_norm:
        tokens = jnp.concatenate([cls_tokens[:, None], patch_tokens], axis=1)
        tokens = _layer_norm(
            tokens, params["norm_scale"].astype(tokens.dtype),
            params["norm_bias"].astype(tokens.dtype), cfg.layer_norm_eps
        )
        cls_tokens = tokens[:, 0]
        patch_tokens = tokens[:, 1:]

    b = patch_tokens.shape[0]
    fmap = patch_tokens.reshape(b, gh, gw, patch_tokens.shape[-1])
    return {"cls_tokens": cls_tokens, "feature_maps": fmap}


def extract_attention_maps(
    params: Dict[str, Any], cfg: DinoV2Config, images_nhwc: Array
) -> Array:
    """Post-softmax attention probabilities [B, heads, T, T] at `cfg.layer`.

    This is the reference's facet="attn": its hook sits on the attention
    module's `attn_drop` (identity in eval), i.e. the softmaxed logits
    BEFORE the value contraction, documented there as shape Bxhxtxt
    (reference: utils/dinov2_utils.py:166-174 hook registration,
    :232-249 `_extract_features` shape contract). T includes the CLS and
    register tokens, exactly as the torch hook sees them.

    Computed functionally: run blocks [0, layer), then LN1 -> qkv ->
    scaled logits -> f32 softmax for block `layer`. This is an extraction
    endpoint, not the serving hot path, so it takes the plain XLA route
    regardless of the fused-block flags (which never change block outputs;
    parity-tested in tests/test_vit_block.py).
    """
    x, _ = embed_tokens(params, cfg, images_nhwc)
    x = _run_blocks(x, params["blocks"], cfg, cfg.layer)
    p = jax.tree.map(lambda a: a[cfg.layer].astype(x.dtype), params["blocks"])
    xn = _layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    qkv = xn @ p["qkv_kernel"] + p["qkv_bias"]
    b, t, _ = qkv.shape
    qkv = qkv.reshape(b, t, 3, cfg.num_heads, cfg.head_dim)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))  # [B, h, T, hd]
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    logits = jnp.einsum("bhqe,bhke->bhqk", q, k) * (cfg.head_dim**-0.5)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def forward_full(
    params: Dict[str, Any], cfg: DinoV2Config, images_nhwc: Array
) -> Array:
    """Full-depth forward returning final-norm tokens [B, T, D] (for tests)."""
    x, _ = embed_tokens(params, cfg, images_nhwc)
    x = _run_blocks(x, params["blocks"], cfg, cfg.depth)
    return _layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.layer_norm_eps)


def normalize_images(images_nhwc: Array) -> Array:
    """ImageNet-stat normalization (reference: utils/dinov2_utils.py:110-113)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=images_nhwc.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=images_nhwc.dtype)
    return (images_nhwc - mean) / std


def make_extractor(model_name: str):
    """Returns (cfg, extract_fn) where extract_fn(params, images_nhwc) runs the
    normalized feature extraction. (reference factory: utils/feature_util.py:18-23)
    """
    cfg = parse_model_name(model_name)

    def extract(params, images_nhwc, compute_dtype=jnp.float32):
        images = normalize_images(images_nhwc).astype(compute_dtype)
        return extract_facet(params, cfg, images)

    return cfg, extract
