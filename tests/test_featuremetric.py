"""Featuremetric refinement tests on a synthetic smooth feature field."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import geometry
from foundpose_tpu.ops.sampling import sample_feature_map
from foundpose_tpu.pose.featuremetric import refine_pose_featuremetric


def smooth_feature_map(hw=30, d=8, crop=420):
    """Features = smooth sinusoids of image position: unique and differentiable."""
    ys, xs = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    u = (xs + 0.5) / hw
    v = (ys + 0.5) / hw
    chans = []
    for k in range(d):
        fx = 0.5 + 0.5 * (k % 3)
        fy = 0.5 + 0.5 * ((k // 3) % 3)
        phase = 0.7 * k
        chans.append(np.sin(2 * np.pi * (fx * u + fy * v) + phase))
    return np.stack(chans, axis=-1).astype(np.float32)


def test_featuremetric_refinement_converges(rng):
    crop = 420
    fmap = smooth_feature_map(30, 8, crop)
    k_f = np.array([600.0, 600.0], dtype=np.float32)
    k_c = np.array([209.5, 209.5], dtype=np.float32)

    r_gt = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t_gt = np.array([0.0, 0.01, 0.55], dtype=np.float32)
    pts3d = rng.uniform(-0.06, 0.06, size=(200, 3)).astype(np.float32)

    # Template descriptors = query features at the GT projections.
    cam = pts3d @ r_gt.T + t_gt
    proj = cam[:, :2] / cam[:, 2:3] * k_f + k_c
    inside = (proj > 30).all(1) & (proj < 390).all(1)
    feats = np.asarray(
        sample_feature_map(jnp.asarray(fmap), jnp.asarray(proj), (crop, crop))
    )

    # Perturbed init: ~3 deg rotation + translation offset.
    r0 = r_gt @ Rotation.from_rotvec([0.03, -0.02, 0.04]).as_matrix().astype(np.float32)
    t0 = t_gt + np.array([0.004, -0.003, 0.008], dtype=np.float32)

    r_ref, t_ref, cost = refine_pose_featuremetric(
        jnp.asarray(r0), jnp.asarray(t0), jnp.asarray(fmap),
        jnp.asarray(k_f), jnp.asarray(k_c),
        jnp.asarray(pts3d), jnp.asarray(feats), jnp.asarray(inside),
        crop_size=(crop, crop), iters=15,
    )
    err0 = float(geometry.rotation_error_deg(jnp.asarray(r0), jnp.asarray(r_gt)))
    err1 = float(geometry.rotation_error_deg(r_ref, jnp.asarray(r_gt)))
    assert err1 < 0.5 * err0, (err0, err1)
    t_err0 = np.linalg.norm(t0 - t_gt)
    t_err1 = np.linalg.norm(np.asarray(t_ref) - t_gt)
    assert t_err1 < 0.5 * t_err0, (t_err0, t_err1)


def test_featuremetric_in_pipeline(rng):
    """The refine_featuremetric flag runs end-to-end in the batched pipeline."""
    import dataclasses

    from foundpose_tpu.pipeline import inference
    from test_pipeline import make_synthetic_world, render_synthetic_query

    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(rng)
    fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
        rng, obj_points, obj_feats, tpl_point_ids, 2
    )
    cameras = jax.tree.map(lambda *x: jnp.stack(x), camera)
    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200,
        refine_featuremetric=True, featuremetric_iters=3,
    )
    out = inference.pose_from_features(
        jnp.asarray(fmap)[None], jnp.asarray(mask)[None], cameras, repre,
        jax.random.PRNGKey(0), config,
    )
    assert bool(out.success[0])
    assert np.isfinite(np.asarray(out.t_m2c)).all()
    # Still near GT (piecewise-constant synthetic features give weak gradients,
    # so just require no catastrophic divergence).
    rot_err = float(geometry.rotation_error_deg(out.R_m2c[0], jnp.asarray(r_gt)))
    assert rot_err < 20.0
