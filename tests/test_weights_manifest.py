"""Checkpoint-layout manifest test for the official DINOv2 loader.

The official `dinov2_<variant>_reg4_pretrain.pth` key/shape layout is public
knowledge (github.com/facebookresearch/dinov2 DinoVisionTransformer state
dict; consumed by the reference via torch.hub at
reference utils/dinov2_utils.py:81-96). The loader
(`models/weights.py:params_from_torch_state_dict`) has so far only been
validated against HF-style synthetic weights — this test pins the EXACT
official manifest so a key-name or shape drift in the loader fails here, not
on the day real weights appear.
"""

import numpy as np
import pytest

from foundpose_tpu.models import dinov2
from foundpose_tpu.models.weights import load_checkpoint, params_from_torch_state_dict


def official_vits14_reg4_manifest():
    """Key -> shape of dinov2_vits14_reg4_pretrain.pth (ViT-S/14, 4 registers,
    embed 384, depth 12, mlp 1536, pretrain resolution 518 -> 37x37 grid)."""
    d, h, depth, grid = 384, 1536, 12, 37
    manifest = {
        "cls_token": (1, 1, d),
        "pos_embed": (1, 1 + grid * grid, d),
        "register_tokens": (1, 4, d),
        "mask_token": (1, d),  # present in official checkpoints; unused here
        "patch_embed.proj.weight": (d, 3, 14, 14),
        "patch_embed.proj.bias": (d,),
        "norm.weight": (d,),
        "norm.bias": (d,),
    }
    for i in range(depth):
        manifest.update(
            {
                f"blocks.{i}.norm1.weight": (d,),
                f"blocks.{i}.norm1.bias": (d,),
                f"blocks.{i}.attn.qkv.weight": (3 * d, d),
                f"blocks.{i}.attn.qkv.bias": (3 * d,),
                f"blocks.{i}.attn.proj.weight": (d, d),
                f"blocks.{i}.attn.proj.bias": (d,),
                f"blocks.{i}.ls1.gamma": (d,),
                f"blocks.{i}.norm2.weight": (d,),
                f"blocks.{i}.norm2.bias": (d,),
                f"blocks.{i}.ls2.gamma": (d,),
                f"blocks.{i}.mlp.fc1.weight": (h, d),
                f"blocks.{i}.mlp.fc1.bias": (h,),
                f"blocks.{i}.mlp.fc2.weight": (d, h),
                f"blocks.{i}.mlp.fc2.bias": (d,),
            }
        )
    return manifest


def synthetic_state_dict(manifest, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    return {
        k: torch.from_numpy(rng.standard_normal(shape).astype(np.float32))
        for k, shape in manifest.items()
    }


VITS_REG_NAME = "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"


def test_loader_consumes_official_vits14_reg4_layout():
    """The loader must read exactly the official keys and produce a pytree
    shape-identical to init_params for the same config."""
    import jax

    cfg = dinov2.parse_model_name(VITS_REG_NAME)
    assert cfg.embed_dim == 384 and cfg.depth == 12
    assert cfg.num_register_tokens == 4 and cfg.pos_grid == 37

    manifest = official_vits14_reg4_manifest()
    state = synthetic_state_dict(manifest)
    params = params_from_torch_state_dict(state, cfg)

    expected = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    exp_shapes = jax.tree.map(lambda x: tuple(x.shape), expected)
    assert got_shapes == exp_shapes

    # Values flow through untouched (modulo the documented transposes).
    np.testing.assert_allclose(
        np.asarray(params["cls_token"]), state["cls_token"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(params["patch_kernel"]),
        state["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["qkv_kernel"][3]),
        state["blocks.3.attn.qkv.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["fc2_kernel"][11]),
        state["blocks.11.mlp.fc2.weight"].numpy().T,
    )


def test_loader_fails_loudly_on_renamed_key():
    """A drifted key name must raise, not silently skip a tensor."""
    cfg = dinov2.parse_model_name(VITS_REG_NAME)
    manifest = official_vits14_reg4_manifest()
    state = synthetic_state_dict(manifest)
    state["blocks.0.attn.qkv_fused.weight"] = state.pop("blocks.0.attn.qkv.weight")
    with pytest.raises(KeyError):
        params_from_torch_state_dict(state, cfg)


def test_load_checkpoint_from_pth_file(tmp_path):
    """End-to-end: torch.save'd official-layout checkpoint loads and runs a
    tiny forward (the file format path, reference dinov2_utils.py:81-96)."""
    import jax
    import jax.numpy as jnp
    import torch

    cfg = dinov2.parse_model_name(VITS_REG_NAME)
    state = synthetic_state_dict(official_vits14_reg4_manifest())
    path = str(tmp_path / "dinov2_vits14_reg4_pretrain.pth")
    torch.save(state, path)

    params = load_checkpoint(path, cfg)
    # 1 ViT-S forward on a 56px crop (4x4 grid) to prove shape compatibility
    # incl. pos-embed interpolation from the 37x37 pretrain grid.
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    out = dinov2.extract_facet(params, cfg, img)
    assert out["feature_maps"].shape == (1, 4, 4, 384)
    assert np.isfinite(np.asarray(out["feature_maps"])).all()
