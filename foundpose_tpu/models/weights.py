"""Weight conversion between JAX params, official DINOv2 checkpoints, and
HuggingFace Dinov2WithRegisters models.

Replaces the reference's torch-hub download path
(reference: utils/dinov2_utils.py:81-96): the backbone weights are loaded from
a local checkpoint file (official `dinov2_<variant>[_reg4]_pretrain.pth`
layout) into the stacked-pytree layout of `models/dinov2.py`. The HF export is
used by tests to validate numerical parity of the JAX ViT against an
independent torch implementation with identical (random) weights — pretrained
downloads are unavailable in this environment.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from foundpose_tpu.models.dinov2 import DinoV2Config


def params_from_torch_state_dict(
    state: Dict[str, Any], cfg: DinoV2Config
) -> Dict[str, Any]:
    """Converts an official DINOv2 state dict to our stacked param pytree.

    Official key layout: cls_token, pos_embed, register_tokens,
    patch_embed.proj.{weight,bias}, blocks.{i}.norm1.*, blocks.{i}.attn.qkv.*,
    blocks.{i}.attn.proj.*, blocks.{i}.ls1.gamma, blocks.{i}.norm2.*,
    blocks.{i}.mlp.{fc1,fc2|w12,w3}.*, blocks.{i}.ls2.gamma, norm.*.
    """
    import jax.numpy as jnp

    def arr(key):
        v = state[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Dict[str, Any] = {
        # torch conv weight (D, 3, P, P) -> HWIO (P, P, 3, D).
        "patch_kernel": jnp.asarray(arr("patch_embed.proj.weight").transpose(2, 3, 1, 0)),
        "patch_bias": jnp.asarray(arr("patch_embed.proj.bias")),
        "cls_token": jnp.asarray(arr("cls_token")),
        "pos_embed": jnp.asarray(arr("pos_embed")),
        "norm_scale": jnp.asarray(arr("norm.weight")),
        "norm_bias": jnp.asarray(arr("norm.bias")),
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = jnp.asarray(arr("register_tokens"))

    def block(i):
        p = {
            "norm1_scale": arr(f"blocks.{i}.norm1.weight"),
            "norm1_bias": arr(f"blocks.{i}.norm1.bias"),
            # torch linear weight (out, in) -> (in, out).
            "qkv_kernel": arr(f"blocks.{i}.attn.qkv.weight").T,
            "qkv_bias": arr(f"blocks.{i}.attn.qkv.bias"),
            "proj_kernel": arr(f"blocks.{i}.attn.proj.weight").T,
            "proj_bias": arr(f"blocks.{i}.attn.proj.bias"),
            "ls1": arr(f"blocks.{i}.ls1.gamma"),
            "norm2_scale": arr(f"blocks.{i}.norm2.weight"),
            "norm2_bias": arr(f"blocks.{i}.norm2.bias"),
            "ls2": arr(f"blocks.{i}.ls2.gamma"),
        }
        if cfg.swiglu:
            p.update(
                w12_kernel=arr(f"blocks.{i}.mlp.w12.weight").T,
                w12_bias=arr(f"blocks.{i}.mlp.w12.bias"),
                w3_kernel=arr(f"blocks.{i}.mlp.w3.weight").T,
                w3_bias=arr(f"blocks.{i}.mlp.w3.bias"),
            )
        else:
            p.update(
                fc1_kernel=arr(f"blocks.{i}.mlp.fc1.weight").T,
                fc1_bias=arr(f"blocks.{i}.mlp.fc1.bias"),
                fc2_kernel=arr(f"blocks.{i}.mlp.fc2.weight").T,
                fc2_bias=arr(f"blocks.{i}.mlp.fc2.bias"),
            )
        return p

    blocks = [block(i) for i in range(cfg.depth)]
    params["blocks"] = {
        k: jnp.stack([jnp.asarray(b[k]) for b in blocks]) for k in blocks[0]
    }
    return params


def load_checkpoint(path: str, cfg: DinoV2Config) -> Dict[str, Any]:
    """Loads an official DINOv2 pretrain checkpoint file into JAX params."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    return params_from_torch_state_dict(state, cfg)


def to_hf_state_dict(params: Dict[str, Any], cfg: DinoV2Config) -> Dict[str, Any]:
    """Exports our params to a transformers Dinov2WithRegistersModel state dict
    (torch tensors). Used by parity tests."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    sd = {
        "embeddings.cls_token": t(params["cls_token"]),
        "embeddings.position_embeddings": t(params["pos_embed"]),
        "embeddings.patch_embeddings.projection.weight": t(
            np.transpose(np.asarray(params["patch_kernel"]), (3, 2, 0, 1))
        ),
        "embeddings.patch_embeddings.projection.bias": t(params["patch_bias"]),
        "layernorm.weight": t(params["norm_scale"]),
        "layernorm.bias": t(params["norm_bias"]),
    }
    if cfg.num_register_tokens:
        sd["embeddings.register_tokens"] = t(params["register_tokens"])

    blocks = params["blocks"]
    d = cfg.embed_dim
    for i in range(cfg.depth):
        b = {k: np.asarray(v[i]) for k, v in blocks.items()}
        pre = f"encoder.layer.{i}"
        qkv_w = b["qkv_kernel"].T  # (3D, D) torch layout
        qkv_b = b["qkv_bias"]
        sd[f"{pre}.norm1.weight"] = t(b["norm1_scale"])
        sd[f"{pre}.norm1.bias"] = t(b["norm1_bias"])
        sd[f"{pre}.attention.attention.query.weight"] = t(qkv_w[:d])
        sd[f"{pre}.attention.attention.query.bias"] = t(qkv_b[:d])
        sd[f"{pre}.attention.attention.key.weight"] = t(qkv_w[d : 2 * d])
        sd[f"{pre}.attention.attention.key.bias"] = t(qkv_b[d : 2 * d])
        sd[f"{pre}.attention.attention.value.weight"] = t(qkv_w[2 * d :])
        sd[f"{pre}.attention.attention.value.bias"] = t(qkv_b[2 * d :])
        sd[f"{pre}.attention.output.dense.weight"] = t(b["proj_kernel"].T)
        sd[f"{pre}.attention.output.dense.bias"] = t(b["proj_bias"])
        sd[f"{pre}.layer_scale1.lambda1"] = t(b["ls1"])
        sd[f"{pre}.norm2.weight"] = t(b["norm2_scale"])
        sd[f"{pre}.norm2.bias"] = t(b["norm2_bias"])
        sd[f"{pre}.layer_scale2.lambda1"] = t(b["ls2"])
        if cfg.swiglu:
            sd[f"{pre}.mlp.weights_in.weight"] = t(b["w12_kernel"].T)
            sd[f"{pre}.mlp.weights_in.bias"] = t(b["w12_bias"])
            sd[f"{pre}.mlp.weights_out.weight"] = t(b["w3_kernel"].T)
            sd[f"{pre}.mlp.weights_out.bias"] = t(b["w3_bias"])
        else:
            sd[f"{pre}.mlp.fc1.weight"] = t(b["fc1_kernel"].T)
            sd[f"{pre}.mlp.fc1.bias"] = t(b["fc1_bias"])
            sd[f"{pre}.mlp.fc2.weight"] = t(b["fc2_kernel"].T)
            sd[f"{pre}.mlp.fc2.bias"] = t(b["fc2_bias"])
    return sd
