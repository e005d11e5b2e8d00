"""Numerical parity of the JAX DINOv2 against transformers' torch
implementation with identical random weights (pretrained weights are not
downloadable here; parity of the *computation* is what these tests pin down).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundpose_tpu.models import dinov2, weights


def tiny_cfg(**kw):
    base = dict(
        variant="vits14",
        embed_dim=64,
        depth=4,
        num_heads=4,
        mlp_ratio=4.0,
        swiglu=False,
        patch_size=14,
        num_register_tokens=4,
        pos_grid=6,  # pretraining grid 6x6 -> 84px "native" input
        stride=14,
        facet="token",
        layer=2,
        apply_norm=True,
    )
    base.update(kw)
    return dinov2.DinoV2Config(**base)


def build_hf_model(cfg, params):
    import torch
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.embed_dim,
        num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads,
        mlp_ratio=int(cfg.mlp_ratio),
        patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_register_tokens,
        image_size=cfg.pos_grid * cfg.patch_size,
        use_swiglu_ffn=cfg.swiglu,
        hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
        attn_implementation="eager",
    )
    model = Dinov2WithRegistersModel(hf_cfg)
    sd = weights.to_hf_state_dict(params, cfg)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # Only mask_token (not used in inference) may be missing.
    assert all("mask_token" in m for m in missing), missing
    assert not unexpected, unexpected
    model.eval()
    return model


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    model = build_hf_model(cfg, params)
    rng = np.random.default_rng(1)
    # Native-resolution input (no pos-embed interpolation on either side).
    images = rng.uniform(size=(2, 84, 84, 3)).astype(np.float32)
    return cfg, params, model, images


def test_full_forward_matches_hf(setup):
    import torch

    cfg, params, model, images = setup
    ours = np.asarray(dinov2.forward_full(params, cfg, jnp.asarray(images)))
    with torch.no_grad():
        out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    theirs = out.last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_intermediate_token_facet_matches_hf(setup):
    import torch

    cfg, params, model, images = setup
    with torch.no_grad():
        out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    # hidden_states[k] = output of block k-1; our facet layer=2 -> block 2 output.
    hs = out.hidden_states[cfg.layer + 1].numpy()

    no_norm_cfg = tiny_cfg(apply_norm=False)
    got = dinov2.extract_facet(params, no_norm_cfg, jnp.asarray(images))
    fmap = np.asarray(got["feature_maps"])  # [B, 6, 6, D]
    cls = np.asarray(got["cls_tokens"])

    np.testing.assert_allclose(cls, hs[:, 0], atol=2e-4)
    patches = hs[:, 1 + cfg.num_register_tokens :].reshape(2, 6, 6, cfg.embed_dim)
    np.testing.assert_allclose(fmap, patches, atol=2e-4)


def test_apply_norm_uses_final_layernorm(setup):
    cfg, params, _, images = setup
    got = dinov2.extract_facet(params, cfg, jnp.asarray(images))
    raw = dinov2.extract_facet(params, tiny_cfg(apply_norm=False), jnp.asarray(images))
    fm_n = np.asarray(got["feature_maps"])
    fm_r = np.asarray(raw["feature_maps"])
    assert not np.allclose(fm_n, fm_r)
    # Manually applying the final LN to [cls, patches] must reproduce it.
    toks = np.concatenate(
        [np.asarray(raw["cls_tokens"])[:, None], fm_r.reshape(2, 36, -1)], axis=1
    )
    mean = toks.mean(-1, keepdims=True)
    var = ((toks - mean) ** 2).mean(-1, keepdims=True)
    ln = (toks - mean) / np.sqrt(var + cfg.layer_norm_eps) * np.asarray(
        params["norm_scale"]
    ) + np.asarray(params["norm_bias"])
    np.testing.assert_allclose(fm_n.reshape(2, 36, -1), ln[:, 1:], atol=1e-4)


def test_qkv_facet_shapes(setup):
    cfg, params, _, images = setup
    for facet in ["query", "key", "value"]:
        c = tiny_cfg(facet=facet, apply_norm=False)
        got = dinov2.extract_facet(params, c, jnp.asarray(images))
        assert got["feature_maps"].shape == (2, 6, 6, cfg.embed_dim)


def test_key_facet_matches_manual(setup):
    cfg, params, _, images = setup
    c = tiny_cfg(facet="key", apply_norm=False)
    got = np.asarray(dinov2.extract_facet(params, c, jnp.asarray(images))["feature_maps"])

    # Manual: run blocks [0, layer), layer-norm, project with K part of qkv.
    x, _ = dinov2.embed_tokens(params, cfg, jnp.asarray(images))
    x = dinov2._run_blocks(x, params["blocks"], cfg, cfg.layer)
    p = jax.tree.map(lambda a: a[cfg.layer], params["blocks"])
    xn = dinov2._layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    qkv = np.asarray(xn @ p["qkv_kernel"] + p["qkv_bias"])
    d = cfg.embed_dim
    k_part = qkv[..., d : 2 * d]  # [B, T, D] head-major layout
    b, t, _ = k_part.shape
    heads = k_part.reshape(b, t, cfg.num_heads, cfg.head_dim)
    ref_layout = np.transpose(heads, (0, 1, 3, 2)).reshape(b, t, d)
    patches = ref_layout[:, 1 + cfg.num_register_tokens :].reshape(b, 6, 6, d)
    np.testing.assert_allclose(got, patches, atol=1e-5)


def test_attn_facet_matches_hf(setup):
    """facet="attn" = post-softmax attention probabilities [B,h,T,T] at the
    target layer (the reference hooks attn_drop; utils/dinov2_utils.py:
    166-174, 232-249). HF's eager attention exposes the same tensor via
    output_attentions."""
    import torch

    cfg, params, model, images = setup
    got = np.asarray(
        dinov2.extract_attention_maps(params, cfg, jnp.asarray(images))
    )
    with torch.no_grad():
        out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            output_attentions=True,
        )
    theirs = out.attentions[cfg.layer].numpy()  # [B, h, T, T]
    assert got.shape == theirs.shape
    np.testing.assert_allclose(got, theirs, atol=2e-5)
    # Rows are probability distributions.
    np.testing.assert_allclose(got.sum(-1), np.ones(got.shape[:-1]), atol=1e-5)


def test_attn_facet_parses_but_is_not_a_descriptor(setup):
    """The DSL accepts facet=attn; the descriptor path rejects it exactly
    like the reference's extract_descriptors assert
    (utils/dinov2_utils.py:281-286)."""
    cfg, params, _, images = setup
    parsed = dinov2.parse_model_name(
        "dinov2_version=vits14-reg_stride=14_facet=attn_layer=9_norm=1"
    )
    assert parsed.facet == "attn"
    with pytest.raises(ValueError, match="extract_attention_maps"):
        dinov2.extract_facet(
            params, tiny_cfg(facet="attn"), jnp.asarray(images)
        )
    with pytest.raises(ValueError, match="unknown dinov2 facet"):
        dinov2.parse_model_name("dinov2_version=vits14_facet=atn")


def test_pos_embed_interpolation_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    pos_grid, d = 6, 16
    pos = rng.normal(size=(1, 1 + pos_grid * pos_grid, d)).astype(np.float32)
    got = np.asarray(
        dinov2.interpolate_pos_embed(jnp.asarray(pos), (4, 4), pos_grid)
    )
    grid = torch.from_numpy(pos[:, 1:].reshape(1, pos_grid, pos_grid, d)).permute(
        0, 3, 1, 2
    )
    # The reference's exact call: scale_factor with the +0.1 offset and
    # recompute_scale_factor=False (utils/dinov2_utils.py:337-355).
    sf = (4 + 0.1) / pos_grid
    exp = F.interpolate(
        grid,
        scale_factor=(sf, sf),
        mode="bicubic",
        align_corners=False,
        recompute_scale_factor=False,
    )
    assert exp.shape[-2:] == (4, 4)
    exp_patch = exp.permute(0, 2, 3, 1).reshape(1, 16, d).numpy()
    np.testing.assert_allclose(got[:, 0], pos[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1:], exp_patch, atol=2e-3)


def test_parse_model_name():
    cfg = dinov2.parse_model_name(
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_logbin=0_norm=1"
    )
    assert cfg.variant == "vits14"
    assert cfg.num_register_tokens == 4
    assert cfg.layer == 9 and cfg.facet == "token" and cfg.apply_norm
    cfg2 = dinov2.parse_model_name("dinov2_vitl14")
    assert cfg2.variant == "vitl14" and cfg2.num_register_tokens == 0
    assert cfg2.embed_dim == 1024 and cfg2.depth == 24
    cfg3 = dinov2.parse_model_name("dinov2_version=vitg14_layer=39_norm=0")
    assert cfg3.swiglu and cfg3.mlp_hidden == 4096 and not cfg3.apply_norm


def test_parse_model_name_rejects_typos():
    """Unknown DSL keys fail loudly instead of silently running defaults
    (a typo like layr=19 must not quietly select layer 9); logbin stays
    whitelisted for reference-config compatibility."""
    import pytest

    with pytest.raises(ValueError, match="layr"):
        dinov2.parse_model_name("dinov2_version=vits14-reg_layr=19")
    with pytest.raises(ValueError, match="malformed"):
        dinov2.parse_model_name("dinov2_vits14-reg_stride=7")
    with pytest.raises(ValueError, match="not a dinov2"):
        dinov2.parse_model_name("resnet50")
    # logbin ignored; value irrelevant.
    cfg = dinov2.parse_model_name("dinov2_version=vits14-reg_logbin=1_layer=5")
    assert cfg.layer == 5


def test_stride_override_token_count():
    cfg = tiny_cfg(stride=7)
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 84, 84, 3))
    out = dinov2.extract_facet(params, cfg, images)
    # 1 + (84-14)//7 = 11 per side.
    assert out["feature_maps"].shape == (1, 11, 11, cfg.embed_dim)


def test_weights_roundtrip_via_official_layout():
    """params -> official-style torch state dict -> params is identity."""
    import torch

    cfg = tiny_cfg()
    params = dinov2.init_params(jax.random.PRNGKey(3), cfg)
    # Build an official-layout state dict from our params.
    sd = {}
    sd["cls_token"] = torch.from_numpy(np.asarray(params["cls_token"]))
    sd["pos_embed"] = torch.from_numpy(np.asarray(params["pos_embed"]))
    sd["register_tokens"] = torch.from_numpy(np.asarray(params["register_tokens"]))
    sd["patch_embed.proj.weight"] = torch.from_numpy(
        np.transpose(np.asarray(params["patch_kernel"]), (3, 2, 0, 1))
    )
    sd["patch_embed.proj.bias"] = torch.from_numpy(np.asarray(params["patch_bias"]))
    sd["norm.weight"] = torch.from_numpy(np.asarray(params["norm_scale"]))
    sd["norm.bias"] = torch.from_numpy(np.asarray(params["norm_bias"]))
    mapping = {
        "qkv_kernel": "attn.qkv.weight",
        "qkv_bias": "attn.qkv.bias",
        "proj_kernel": "attn.proj.weight",
        "proj_bias": "attn.proj.bias",
        "norm1_scale": "norm1.weight",
        "norm1_bias": "norm1.bias",
        "norm2_scale": "norm2.weight",
        "norm2_bias": "norm2.bias",
        "ls1": "ls1.gamma",
        "ls2": "ls2.gamma",
        "fc1_kernel": "mlp.fc1.weight",
        "fc1_bias": "mlp.fc1.bias",
        "fc2_kernel": "mlp.fc2.weight",
        "fc2_bias": "mlp.fc2.bias",
    }
    for i in range(cfg.depth):
        for ours, official in mapping.items():
            v = np.asarray(params["blocks"][ours][i])
            if ours.endswith("_kernel"):
                v = v.T
            sd[f"blocks.{i}.{official}"] = torch.from_numpy(np.ascontiguousarray(v))

    back = weights.params_from_torch_state_dict(sd, cfg)
    for k in ["patch_kernel", "cls_token", "pos_embed", "norm_scale"]:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]), atol=1e-6)
    for k in params["blocks"]:
        np.testing.assert_allclose(
            np.asarray(back["blocks"][k]), np.asarray(params["blocks"][k]), atol=1e-6
        )


def test_approx_gelu_feature_parity(rng):
    """approx_gelu (tanh) features match the exact-erf model within bf16-level
    noise (max |exact-tanh| gelu deviation is 5e-4; see DinoV2Config)."""
    import dataclasses

    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=64, depth=4, num_heads=4, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=8,
        stride=14, facet="token", layer=3, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 112, 112, 3)).astype(np.float32))
    exact = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    approx = dinov2.extract_facet(
        params, dataclasses.replace(cfg, approx_gelu=True), imgs
    )["feature_maps"]
    scale = float(jnp.std(exact))
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(exact), atol=5e-3 * max(scale, 1.0)
    )
