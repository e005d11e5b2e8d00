"""Parity of the fused transformer-block kernel vs the unfused block path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from foundpose_tpu.models import dinov2


def tiny_cfg(**kw):
    base = dict(
        variant="vits14", embed_dim=64, depth=3, num_heads=4, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=2, apply_norm=True,
    )
    base.update(kw)
    return dinov2.DinoV2Config(**base)


def test_fused_block_matches_unfused(rng):
    """Whole extract_facet path: fused-kernel blocks == unfused blocks
    (same dtype, interpreter mode on CPU)."""
    cfg = tiny_cfg()
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 98, 98, 3)).astype(np.float32))

    ref = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    with pltpu.force_tpu_interpret_mode():
        fused = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True), imgs
        )["feature_maps"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_fused_block_single_layer_parity(rng):
    """One fused_vit_block call == one unfused _block on padded tokens
    (valid rows only; padded rows are free to differ)."""
    from foundpose_tpu.ops.vit_block import fused_vit_block

    cfg = tiny_cfg(depth=1)
    params = dinov2.init_params(jax.random.PRNGKey(1), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])

    t, t_pad, d = 100, 128, cfg.embed_dim
    x = jnp.asarray(rng.normal(size=(2, t, d)).astype(np.float32))
    ref = dinov2._block(x, layer, cfg)

    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    with pltpu.force_tpu_interpret_mode():
        out = fused_vit_block(
            xp, layer, seq_len=t, num_heads=cfg.num_heads,
            head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
        )
    np.testing.assert_allclose(
        np.asarray(out[:, :t]), np.asarray(ref), atol=2e-4
    )


def test_fused_block_capped_stabilizer_matches_column(rng):
    """softmax_stabilizer="capped" == "column" at realistic logit scales
    (bit-equality is expected when no logit exceeds the cap)."""
    cfg = tiny_cfg()
    params = dinov2.init_params(jax.random.PRNGKey(3), cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 98, 98, 3)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        col = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True), imgs
        )["feature_maps"]
        cap = dinov2.extract_facet(
            params,
            dataclasses.replace(
                cfg, use_fused_block=True, softmax_stabilizer="capped"
            ),
            imgs,
        )["feature_maps"]
    np.testing.assert_allclose(np.asarray(cap), np.asarray(col), atol=2e-5)


def test_fused_block_bf16(rng):
    """bf16 path stays close to the f32 unfused reference."""
    cfg = tiny_cfg()
    params = dinov2.init_params(jax.random.PRNGKey(2), cfg)
    imgs = jnp.asarray(rng.uniform(size=(1, 98, 98, 3)).astype(np.float32))

    ref = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    with pltpu.force_tpu_interpret_mode():
        fused16 = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True),
            imgs.astype(jnp.bfloat16),
        )["feature_maps"]
    scale = float(jnp.std(ref))
    np.testing.assert_allclose(
        np.asarray(fused16, dtype=np.float32), np.asarray(ref),
        atol=0.1 * max(scale, 1.0),
    )


def test_fused_block_swiglu_parity(rng):
    """SwiGLU (ViT-G-style) fused blocks == unfused blocks, exercising the
    w12/w3 MLP branch and the in-kernel token chunking."""
    cfg = tiny_cfg(swiglu=True)
    params = dinov2.init_params(jax.random.PRNGKey(5), cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 98, 98, 3)).astype(np.float32))

    ref = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    with pltpu.force_tpu_interpret_mode():
        fused = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True), imgs
        )["feature_maps"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_fused_block_mlp_chunked_parity(rng):
    """Forcing mlp_chunks > 1 through the kernel must be output-identical to
    the unchunked kernel (the chunking is a pure tiling of per-token work)."""
    from foundpose_tpu.ops import vit_block as vb

    cfg = tiny_cfg(depth=1)
    params = dinov2.init_params(jax.random.PRNGKey(6), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])

    t, t_pad, d = 60, 64, cfg.embed_dim
    x = jnp.asarray(rng.normal(size=(1, t, d)).astype(np.float32))
    ref = dinov2._block(x, layer, cfg)
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    # Shrink the VMEM budget so choose_mlp_chunks is forced past 1 chunk.
    est1 = vb.fused_block_vmem_bytes(
        t_pad, d, int(d * cfg.mlp_ratio), 4, mlp_chunks=1
    )
    orig = vb.VMEM_LIMIT_BYTES
    vb.VMEM_LIMIT_BYTES = est1 - 1
    try:
        chunks = vb.choose_mlp_chunks(t_pad, d, int(d * cfg.mlp_ratio), 4, False)
        assert chunks is not None and chunks > 1
        with pltpu.force_tpu_interpret_mode():
            out = vb.fused_vit_block(
                xp, layer, seq_len=t, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
            )
    finally:
        vb.VMEM_LIMIT_BYTES = orig
    np.testing.assert_allclose(
        np.asarray(out[:, :t]), np.asarray(ref), atol=2e-4
    )


def test_fused_block_two_images_per_step(rng):
    """images_per_step=2 grid layout == per-image layout (pure re-tiling)."""
    cfg = tiny_cfg(fused_images_per_step=2)
    params = dinov2.init_params(jax.random.PRNGKey(7), cfg)
    imgs = jnp.asarray(rng.uniform(size=(4, 98, 98, 3)).astype(np.float32))

    ref = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    with pltpu.force_tpu_interpret_mode():
        fused = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True), imgs
        )["feature_maps"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_fused_block_paired_heads_parity(rng):
    """Head-paired logits/output matmuls == per-head layout (both
    stabilizers; pure re-tiling of independent heads)."""
    from foundpose_tpu.ops.vit_block import fused_vit_block

    cfg = tiny_cfg(depth=1)
    params = dinov2.init_params(jax.random.PRNGKey(2), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])

    t, t_pad = 100, 128
    x = jnp.asarray(rng.normal(size=(2, t, cfg.embed_dim)).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    for stab in ("column", "capped"):
        with pltpu.force_tpu_interpret_mode():
            ref = fused_vit_block(
                xp, layer, seq_len=t, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
                softmax_stabilizer=stab,
            )
            paired = fused_vit_block(
                xp, layer, seq_len=t, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
                softmax_stabilizer=stab, paired_heads=True,
            )
        np.testing.assert_allclose(
            np.asarray(paired[:, :t]), np.asarray(ref[:, :t]), atol=2e-4
        )


def test_fused_block_paired_heads_facet(rng):
    """extract_facet with fused_paired_heads == the unfused path."""
    cfg = tiny_cfg(fused_paired_heads=True)
    params = dinov2.init_params(jax.random.PRNGKey(8), cfg)
    imgs = jnp.asarray(rng.uniform(size=(2, 98, 98, 3)).astype(np.float32))

    ref = dinov2.extract_facet(params, cfg, imgs)["feature_maps"]
    with pltpu.force_tpu_interpret_mode():
        fused = dinov2.extract_facet(
            params, dataclasses.replace(cfg, use_fused_block=True), imgs
        )["feature_maps"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)
