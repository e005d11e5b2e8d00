import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu.ops.attention import fused_attention


def test_fused_attention_matches_sdpa(rng):
    b, t, h, dh = 2, 37, 3, 16  # odd T exercises padding/masking
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    got = fused_attention(q, k, v, block_q=128, interpret=True)
    exp = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)


def test_fused_attention_exact_multiple(rng):
    b, t, h, dh = 1, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)).astype(np.float32))
    got = fused_attention(q, k, v, block_q=128, interpret=True)
    exp = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)


def test_vit_with_pallas_attention_matches(rng):
    """Full tiny ViT: pallas-attention path == SDPA path (interpreter mode)."""
    import dataclasses

    from foundpose_tpu.models import dinov2
    from jax.experimental.pallas import tpu as pltpu

    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=64, depth=2, num_heads=4, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.uniform(size=(1, 84, 84, 3)).astype(np.float32))
    base = dinov2.extract_facet(params, cfg, images)

    cfg_p = dataclasses.replace(cfg, use_pallas_attention=True)
    with pltpu.force_tpu_interpret_mode():
        got = dinov2.extract_facet(params, cfg_p, images)
    np.testing.assert_allclose(
        np.asarray(got["feature_maps"]), np.asarray(base["feature_maps"]), atol=1e-4
    )
