"""Calibrated "realistic-statistics" bench weights (models/bench_weights.py).

The capped softmax stabilizer's correctness argument rests on pretrained
DINOv2's attention logits staying within ~+-30 (models/dinov2.py). No
pretrained checkpoint is reachable here, so the bench runs weights whose
per-layer logit maxima are CALIBRATED to that range — these tests pin the
calibration and re-verify the stabilizer + bf16 fast paths in that regime
(VERDICT r3 directive 6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from foundpose_tpu.models import bench_weights, dinov2


def tiny_cfg(**kw):
    base = dict(
        variant="vits14", embed_dim=64, depth=3, num_heads=4, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=2, apply_norm=True,
    )
    base.update(kw)
    return dinov2.DinoV2Config(**base)


def test_calibration_hits_target_and_is_deterministic():
    cfg = tiny_cfg()
    before = bench_weights.attention_logit_maxima(
        dinov2.init_params(jax.random.PRNGKey(0), cfg), cfg
    )
    # Random init is far below the production logit range (the condition
    # that made the r3 bench's stabilizer coverage vacuous).
    assert before.max() < 5.0

    p1 = bench_weights.realistic_params(jax.random.PRNGKey(0), cfg)
    after = bench_weights.attention_logit_maxima(p1, cfg)
    np.testing.assert_allclose(after, 30.0, rtol=1e-4)

    p2 = bench_weights.realistic_params(jax.random.PRNGKey(0), cfg)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Layerscale is set to the trained-model magnitude.
    np.testing.assert_allclose(np.asarray(p1["blocks"]["ls1"]), 0.1)


def test_capped_stabilizer_exact_at_calibrated_logit_range(rng):
    """capped == column softmax stabilizer ON THE CALIBRATED WEIGHTS —
    max |logit| ~ 30, the regime the +-99 exactness window is claimed for
    (the r3 test only covered random-init's |logit| < 5)."""
    cfg = tiny_cfg()
    params = bench_weights.realistic_params(jax.random.PRNGKey(3), cfg)
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


def test_bf16_fused_path_on_calibrated_weights(rng):
    """bf16 fused blocks stay scale-relatively close to the f32 unfused
    reference on the peaked-attention, grown-residual statistics."""
    cfg = tiny_cfg()
    params = bench_weights.realistic_params(jax.random.PRNGKey(2), cfg)
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


@pytest.mark.slow
def test_bench_shape_logit_window():
    """The capped-stabilizer window must hold at the BENCH shape (420 px,
    ~905 tokens), not just the 154-px calibration probe: the max over ~50x
    more token pairs is what the benched program actually sees. bench.py
    asserts the same thing at runtime; this pins it in CI (ADVICE r4)."""
    cfg = dataclasses.replace(
        dinov2.parse_model_name(
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
        ),
        softmax_stabilizer="capped",
    )
    params = bench_weights.realistic_params(jax.random.PRNGKey(0), cfg)
    maxima = bench_weights.attention_logit_maxima(
        params, cfg, probe_size=420, probe_batch=1
    )
    # Calibrated to 30 at 154 px; measured 33-36 at 420 px — growth is
    # logarithmic in pair count, far from the < ~99 exactness window.
    assert maxima.max() < 50.0, maxima
