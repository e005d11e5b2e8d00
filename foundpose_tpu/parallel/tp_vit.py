"""Tensor-parallel DINOv2 forward: attention heads + MLP hidden sharded
over a `model` mesh axis.

No reference counterpart (the reference is strictly single-device,
SURVEY.md §2.4). Data parallelism (parallel/mesh.py) scales with the crop
batch; the `model` axis scales the OTHER direction — one big ViT (vitg14,
1.1B params: /root/reference/utils/dinov2_utils.py:81-84 lists it as a
first-class extractor) split across chips so its weights and activations
fit and each layer's matmuls run at full MXU width per chip.

The sharding is the standard Megatron split mapped to shard_map + XLA
collectives over ICI:

- qkv kernel sharded on the HEAD axis -> each device computes attention for
  its nh/n heads (attention is embarrassingly parallel over heads),
- the output projection sharded on its INPUT (head) axis -> each device
  produces a partial [B,T,D] sum, combined with ONE `psum` per layer,
- MLP fc1 sharded on the hidden axis, fc2 on its input axis -> a second
  `psum` per layer.

Two psums of [B,T,D] per block is the minimum collective traffic for this
split; everything else (LN, layerscale, residual) is local. Activations
stay replicated over `model`, so the same crop batch can ALSO be sharded
over a `data` axis in the same mesh (the in_specs only name the model
axis; shard_map partitions over whatever other axes the mesh has).

Params are pre-factored into head/hidden-major layouts by
`prepare_tp_params` (the flat [D, 3D] qkv layout interleaves q/k/v so a
contiguous split would cross the q|k|v boundary), then placed with
`shard_tp_params`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from foundpose_tpu.models import dinov2
from foundpose_tpu.models.dinov2 import DinoV2Config, _layer_norm
from foundpose_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def validate_tp(cfg: DinoV2Config, n_model: int) -> None:
    """TP width must divide both the head count and the MLP hidden width."""
    if cfg.num_heads % n_model != 0:
        raise ValueError(
            f"model axis {n_model} does not divide num_heads={cfg.num_heads}"
        )
    if cfg.mlp_hidden % n_model != 0:
        raise ValueError(
            f"model axis {n_model} does not divide mlp_hidden={cfg.mlp_hidden}"
        )


def prepare_tp_params(params: Dict[str, Any], cfg: DinoV2Config) -> Dict[str, Any]:
    """Re-factors the stacked block params into head/hidden-major layouts so
    every TP-sharded axis is a real array axis (shardable with a PartitionSpec):

      qkv_kernel  [L, D, 3D]   -> [L, D, 3, nh, hd]   (shard nh)
      qkv_bias    [L, 3D]      -> [L, 3, nh, hd]      (shard nh)
      proj_kernel [L, D, D]    -> [L, nh, hd, D]      (shard nh)
      fc1/w12     hidden-major as stored               (shard hidden)
      w12_kernel  [L, D, 2H]   -> [L, D, 2, H]        (shard H; the flat
                                                       layout concatenates
                                                       w1|w2 so a flat split
                                                       crosses the boundary)

    Non-block params pass through unchanged.
    """
    nh, hd = cfg.num_heads, cfg.head_dim
    blocks = dict(params["blocks"])
    L = blocks["qkv_kernel"].shape[0]
    d = cfg.embed_dim
    blocks["qkv_kernel"] = blocks["qkv_kernel"].reshape(L, d, 3, nh, hd)
    blocks["qkv_bias"] = blocks["qkv_bias"].reshape(L, 3, nh, hd)
    # proj input dim is the (nh, hd)-flattened head axis (dinov2._attention
    # merges heads row-major before the projection).
    blocks["proj_kernel"] = blocks["proj_kernel"].reshape(L, nh, hd, d)
    if cfg.swiglu:
        h = cfg.mlp_hidden
        blocks["w12_kernel"] = blocks["w12_kernel"].reshape(L, d, 2, h)
        blocks["w12_bias"] = blocks["w12_bias"].reshape(L, 2, h)
    out = dict(params)
    out["blocks"] = blocks
    return out


# PartitionSpecs for the factored block layouts (leading axis = layer stack).
_BLOCK_SPECS = {
    "qkv_kernel": P(None, None, None, MODEL_AXIS),
    "qkv_bias": P(None, None, MODEL_AXIS),
    "proj_kernel": P(None, MODEL_AXIS),
    "fc1_kernel": P(None, None, MODEL_AXIS),
    "fc1_bias": P(None, MODEL_AXIS),
    "fc2_kernel": P(None, MODEL_AXIS),
    "w12_kernel": P(None, None, None, MODEL_AXIS),
    "w12_bias": P(None, None, MODEL_AXIS),
    "w3_kernel": P(None, MODEL_AXIS),
}


def tp_param_specs(params_tp: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching prepare_tp_params' output: sharded block
    matmul weights per _BLOCK_SPECS, everything else replicated."""
    blocks = {
        k: _BLOCK_SPECS.get(k, P()) for k in params_tp["blocks"]
    }
    specs = {k: P() for k in params_tp if k != "blocks"}
    specs["blocks"] = blocks
    return specs


def tp_param_specs_from_cfg(cfg: DinoV2Config) -> Dict[str, Any]:
    """Same spec pytree derived from the config alone (for callers that must
    fix shard_map in_specs before any params exist, e.g.
    parallel/sharded_inference.make_sharded_step). Key set mirrors
    dinov2.init_params / models.weights; asserted in tests/test_tp_vit.py."""
    mlp_keys = (
        ("w12_kernel", "w12_bias", "w3_kernel", "w3_bias")
        if cfg.swiglu
        else ("fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias")
    )
    block_keys = (
        "norm1_scale", "norm1_bias", "qkv_kernel", "qkv_bias",
        "proj_kernel", "proj_bias", "ls1",
        "norm2_scale", "norm2_bias", "ls2",
    ) + mlp_keys
    specs: Dict[str, Any] = {
        k: P()
        for k in (
            "patch_kernel", "patch_bias", "cls_token", "pos_embed",
            "norm_scale", "norm_bias",
        )
    }
    if cfg.num_register_tokens:
        specs["register_tokens"] = P()
    specs["blocks"] = {k: _BLOCK_SPECS.get(k, P()) for k in block_keys}
    return specs


def shard_tp_params(
    params_tp: Dict[str, Any], mesh: Mesh
) -> Dict[str, Any]:
    """Places factored params on the mesh (weights split over MODEL_AXIS)."""
    specs = tp_param_specs(params_tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params_tp,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _tp_attention(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    """Attention over this device's head shard. Returns the PARTIAL [B,T,D]
    projection sum (psum + bias happen in the caller)."""
    # p["qkv_kernel"]: [D, 3, nh_local, hd]; p["proj_kernel"]: [nh_local, hd, D]
    qkv = jnp.einsum("btd,dkhe->kbthe", x, p["qkv_kernel"])
    qkv = qkv + p["qkv_bias"][:, None, None]  # [3, B, T, nh_local, hd]
    out = jax.nn.dot_product_attention(qkv[0], qkv[1], qkv[2])  # [B,T,nhl,hd]
    return jnp.einsum("bthe,hed->btd", out, p["proj_kernel"])


def _tp_mlp(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    """MLP over this device's hidden shard. Returns the PARTIAL [B,T,D] sum."""
    if cfg.swiglu:
        x12 = jnp.einsum("btd,dkh->btkh", x, p["w12_kernel"]) + p["w12_bias"]
        h = jax.nn.silu(x12[:, :, 0]) * x12[:, :, 1]
        return h @ p["w3_kernel"]
    h = jax.nn.gelu(
        x @ p["fc1_kernel"] + p["fc1_bias"], approximate=cfg.approx_gelu
    )
    return h @ p["fc2_kernel"]


def _tp_block(x: Array, p: Dict[str, Array], cfg: DinoV2Config) -> Array:
    """One transformer block with heads/hidden sharded over MODEL_AXIS.
    Exactly two [B,T,D] psums; bias and layerscale applied once, post-psum."""
    eps = cfg.layer_norm_eps
    a = _tp_attention(_layer_norm(x, p["norm1_scale"], p["norm1_bias"], eps), p, cfg)
    a = jax.lax.psum(a, MODEL_AXIS) + p["proj_bias"]
    x = x + p["ls1"] * a
    m = _tp_mlp(_layer_norm(x, p["norm2_scale"], p["norm2_bias"], eps), p, cfg)
    bias = p["w3_bias"] if cfg.swiglu else p["fc2_bias"]
    m = jax.lax.psum(m, MODEL_AXIS) + bias
    return x + p["ls2"] * m


def _tp_run_blocks(
    x: Array, blocks: Dict[str, Array], cfg: DinoV2Config, upto: int
) -> Array:
    if upto == 0:
        return x
    sliced = jax.tree.map(lambda a: a[:upto].astype(x.dtype), blocks)

    def body(h, p):
        return _tp_block(h, p, cfg), None

    out, _ = jax.lax.scan(body, x, sliced)
    return out


def tp_extract_local(
    params: Dict[str, Any], cfg: DinoV2Config, images_nhwc: Array
) -> Dict[str, Array]:
    """Per-device body (runs inside shard_map): embed on the local crop shard,
    TP blocks with psums over MODEL_AXIS, facet selection + final norm.
    Mirrors dinov2.extract_facet exactly (same facet and norm semantics)."""
    x, (gh, gw) = dinov2.embed_tokens(params, cfg, images_nhwc)
    blocks = params["blocks"]

    if cfg.facet == "token":
        feats = _tp_run_blocks(x, blocks, cfg, cfg.layer + 1)
    elif cfg.facet in ("query", "key", "value"):
        x = _tp_run_blocks(x, blocks, cfg, cfg.layer)
        p = jax.tree.map(lambda a: a[cfg.layer].astype(x.dtype), blocks)
        xn = _layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
        idx = {"query": 0, "key": 1, "value": 2}[cfg.facet]
        sel = jnp.einsum("btd,dhe->bthe", xn, p["qkv_kernel"][:, idx])
        sel = sel + p["qkv_bias"][idx][None, None]  # [B, T, nh_local, hd]
        # The reference flattens heads head-MINOR (permute(0,2,3,1).flatten):
        # gather the full head axis, then transpose hd<->nh before merging.
        sel = jax.lax.all_gather(sel, MODEL_AXIS, axis=2, tiled=True)
        b, t = sel.shape[:2]
        feats = jnp.transpose(sel, (0, 1, 3, 2)).reshape(b, t, cfg.embed_dim)
    else:
        raise ValueError(f"unsupported facet: {cfg.facet}")

    cls_tokens = feats[:, 0]
    patch_tokens = feats[:, 1 + cfg.num_register_tokens :]
    if cfg.apply_norm:
        tokens = jnp.concatenate([cls_tokens[:, None], patch_tokens], axis=1)
        tokens = _layer_norm(
            tokens, params["norm_scale"].astype(tokens.dtype),
            params["norm_bias"].astype(tokens.dtype), cfg.layer_norm_eps,
        )
        cls_tokens = tokens[:, 0]
        patch_tokens = tokens[:, 1:]
    b = patch_tokens.shape[0]
    fmap = patch_tokens.reshape(b, gh, gw, patch_tokens.shape[-1])
    return {"cls_tokens": cls_tokens, "feature_maps": fmap}


def make_tp_extractor(mesh: Mesh, cfg: DinoV2Config):
    """Returns extract(params_tp, images_nhwc) -> facet dict, with weights
    sharded over MODEL_AXIS and images sharded over DATA_AXIS when the mesh
    has one. params_tp comes from prepare_tp_params (+ shard_tp_params).

    The TP path uses the unfused block math (the fused Pallas block computes
    a whole layer in one kernel, so the two mid-layer psums this split needs
    cannot be placed inside it; per-shard matmuls here are full-width MXU
    work anyway). jit of the returned fn compiles ONE SPMD program whose
    per-layer collectives are exactly two psum([B,T,D]) — asserted in
    tests/test_tp_vit.py.
    """
    n_model = mesh.shape[MODEL_AXIS]
    validate_tp(cfg, n_model)
    data_in_mesh = DATA_AXIS in mesh.axis_names
    img_spec = P(DATA_AXIS) if data_in_mesh else P()
    cfg_local = dataclasses.replace(
        cfg, use_fused_block=False, use_pallas_attention=False
    )

    def _body(params_tp, images):
        return tp_extract_local(params_tp, cfg_local, images)

    def extract(params_tp, images_nhwc, compute_dtype=jnp.float32):
        images = dinov2.normalize_images(images_nhwc).astype(compute_dtype)
        specs = tp_param_specs(params_tp)
        out_spec = {"cls_tokens": img_spec, "feature_maps": img_spec}
        fn = jax.shard_map(
            _body, mesh=mesh, in_specs=(specs, img_spec), out_specs=out_spec,
            check_vma=False,
        )
        return fn(params_tp, images)

    return extract
