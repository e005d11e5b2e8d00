import dataclasses

import numpy as np

from foundpose_tpu import engine as engine_mod
from foundpose_tpu.models import dinov2
from foundpose_tpu.pipeline import inference

from test_pipeline import make_synthetic_world


def test_engine_estimates_batch(rng, monkeypatch):
    eng = engine_mod.PoseEngine.__new__(engine_mod.PoseEngine)
    # Tiny ViT for CPU speed.
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    import jax

    eng.vit_cfg = cfg
    eng.vit_params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    eng.config = inference.InferenceConfig(
        crop_size=(84, 84), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50, lm_iters=3,
    )
    eng.batch_size = 2
    eng._repres = {}
    eng._step = inference.jit_pose_from_crops(cfg, eng.config)
    eng._warp_single = engine_mod._make_single_image_warp(eng.config.crop_size)
    eng._multi_cache = None
    eng._counter = 0

    repre, *_ = make_synthetic_world(rng, feat_dim=32)
    eng.register_object(9, repre)
    assert eng.object_ids == [9]
    # Empty detection lists are a routine serving case.
    assert eng.estimate(9, np.zeros((48, 64, 3), np.uint8), [], np.eye(3)) == []
    assert eng.estimate_mixed(np.zeros((48, 64, 3), np.uint8), [], np.eye(3)) == []

    image = (rng.uniform(size=(240, 320, 3)) * 255).astype(np.uint8)
    K = np.array([[300.0, 0, 159.5], [0, 300.0, 119.5], [0, 0, 1]])
    boxes = [
        np.array([80.0, 60.0, 180.0, 160.0]),
        np.array([100.0, 80.0, 220.0, 200.0]),
        np.array([50.0, 40.0, 150.0, 140.0]),
    ]
    out = eng.estimate(9, image, boxes, K)
    assert len(out) == 3
    for r in out:
        assert r["R_m2c"].shape == (3, 3)
        assert np.isfinite(r["t_m2c"]).all()
        assert r["crop_camera"].width == 84


def test_engine_estimate_mixed(rng):
    """Mixed-object serving: detections of two registered objects share
    batches through the stacked multi-object step."""
    eng = engine_mod.PoseEngine.__new__(engine_mod.PoseEngine)
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    import jax

    eng.vit_cfg = cfg
    eng.vit_params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    eng.config = inference.InferenceConfig(
        crop_size=(84, 84), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50, lm_iters=3,
    )
    eng.batch_size = 2
    eng._repres = {}
    eng._multi_cache = None
    eng._step = inference.jit_pose_from_crops(cfg, eng.config)
    eng._warp_single = engine_mod._make_single_image_warp(eng.config.crop_size)
    eng._counter = 0

    rng2 = np.random.default_rng(5)
    repre_a, *_ = make_synthetic_world(rng, feat_dim=32)
    repre_b, *_ = make_synthetic_world(rng2, feat_dim=32, num_templates=6)
    eng.register_object(3, repre_a)
    eng.register_object(7, repre_b)

    image = (rng.uniform(size=(240, 320, 3)) * 255).astype(np.uint8)
    K = np.array([[300.0, 0, 159.5], [0, 300.0, 119.5], [0, 0, 1]])
    detections = [
        {"obj_id": 3, "box_xyxy": np.array([80.0, 60.0, 180.0, 160.0])},
        {"obj_id": 7, "box_xyxy": np.array([100.0, 80.0, 220.0, 200.0])},
        {"obj_id": 3, "box_xyxy": np.array([50.0, 40.0, 150.0, 140.0])},
    ]
    out = eng.estimate_mixed(image, detections, K)
    assert len(out) == 3
    for r in out:
        assert r["R_m2c"].shape == (3, 3)
        assert np.isfinite(r["t_m2c"]).all()
    # Re-registering invalidates the stacked cache.
    eng.register_object(9, repre_a)
    assert eng._multi_cache is None
