"""AR-level equivalence of the fast path (bf16 + approximate top-k) vs the
exact path (f32 + exact top-k) on a structured synthetic benchmark world.

The bench configuration (`bench.py`) runs bf16 compute with approximate top-k
buddy selection; this test establishes that the accuracy contract of
configs/infer/lmo.json survives those substitutions at the POSE/AR level, not
just on a single GT-recovery case: many crops, varied ground-truth poses,
descriptor noise and clutter cells, recall compared between the two configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import geometry
from foundpose_tpu.pipeline import inference
from test_pipeline import make_synthetic_world


def render_noisy_query(rng, obj_points, obj_feats, tpl_point_ids, target_tpl,
                       pose_seed, crop_size=(420, 420), cell=14.0,
                       feat_noise=0.3, clutter_cells=40):
    """A crop viewing the object under a random GT pose, with noisy
    descriptors and clutter cells inside the mask (unlike the clean
    render_synthetic_query, this stresses retrieval + RANSAC)."""
    pr = np.random.default_rng(pose_seed)
    r_gt = Rotation.from_rotvec(pr.uniform(-0.3, 0.3, 3)).as_matrix().astype(
        np.float32
    )
    t_gt = np.array(
        [pr.uniform(-0.02, 0.02), pr.uniform(-0.02, 0.02), pr.uniform(0.45, 0.6)],
        dtype=np.float32,
    )
    k_f = np.array([600.0, 600.0], dtype=np.float32)
    k_c = np.array([209.5, 209.5], dtype=np.float32)

    pts = obj_points[tpl_point_ids[target_tpl]]
    feats = obj_feats[tpl_point_ids[target_tpl]]
    cam = pts @ r_gt.T + t_gt
    proj = cam[:, :2] / cam[:, 2:3] * k_f + k_c

    gw, gh = int(crop_size[0] / cell), int(crop_size[1] / cell)
    d = obj_feats.shape[1]
    fmap = rng.normal(size=(gh, gw, d)).astype(np.float32) * 0.05
    mask = np.zeros((crop_size[1], crop_size[0]), dtype=np.float32)

    c = int(cell)
    for p, f in zip(proj, feats):
        cx = int(p[0] // cell)
        cy = int(p[1] // cell)
        if 0 <= cx < gw and 0 <= cy < gh:
            fmap[cy, cx] = f + feat_noise * rng.normal(size=d).astype(np.float32)
            mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    # Clutter: masked cells whose descriptors belong to no object point.
    for _ in range(clutter_cells):
        cx, cy = rng.integers(0, gw), rng.integers(0, gh)
        fmap[cy, cx] = rng.normal(size=d).astype(np.float32) * 3.0
        mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    from foundpose_tpu.structs import PinholeCamera

    camera = PinholeCamera(
        f=jnp.asarray(k_f), c=jnp.asarray(k_c),
        T_world_from_eye=jnp.eye(4), width=420, height=420,
    )
    return fmap, mask, camera, r_gt, t_gt


def recall(out, rs_gt, ts_gt, rot_thresh_deg=5.0, t_thresh=0.015):
    """AR-style success fraction: pose within 5 deg / 15 mm of GT."""
    ok = []
    for i, (r_gt, t_gt) in enumerate(zip(rs_gt, ts_gt)):
        rot_err = float(
            geometry.rotation_error_deg(out.R_m2c[i], jnp.asarray(r_gt))
        )
        t_err = float(np.linalg.norm(np.asarray(out.t_m2c[i]) - t_gt))
        ok.append(
            bool(np.asarray(out.success)[i])
            and rot_err < rot_thresh_deg
            and t_err < t_thresh
        )
    return float(np.mean(ok)), ok


def test_fastpath_matches_exact_at_ar_level(rng):
    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(
        rng, num_templates=12, pts_per_template=80, feat_dim=48
    )
    # >= 100 crops so the recall gate has statistical power: "within one
    # crop" at 12 crops meant 8.3 pts of slack; at 100 it is 1 pt and the
    # gate below allows 2 (matching the full-scale cross-parity margins).
    n_crops = 100
    fmaps, masks, cam_list, rs, ts = [], [], [], [], []
    for i in range(n_crops):
        fmap, mask, camera, r_gt, t_gt = render_noisy_query(
            rng, obj_points, obj_feats, tpl_point_ids,
            target_tpl=i % 12, pose_seed=100 + i,
        )
        fmaps.append(fmap)
        masks.append(mask)
        cam_list.append(camera)
        rs.append(r_gt)
        ts.append(t_gt)
    cameras = jax.tree.map(lambda *x: jnp.stack(x), *cam_list)
    fmaps = jnp.asarray(np.stack(fmaps))
    masks = jnp.asarray(np.stack(masks))

    base = dict(top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=300)
    exact_cfg = inference.InferenceConfig(**base)
    fast_cfg = inference.InferenceConfig(
        **base, compute_dtype=jnp.bfloat16, approx_topk=True
    )

    out_exact = inference.pose_from_features(
        fmaps, masks, cameras, repre, jax.random.PRNGKey(0), exact_cfg
    )
    out_fast = inference.pose_from_features(
        fmaps, masks, cameras, repre, jax.random.PRNGKey(0), fast_cfg
    )

    ar_exact, ok_exact = recall(out_exact, rs, ts)
    ar_fast, ok_fast = recall(out_fast, rs, ts)

    # The exact path must actually work on this world (the comparison is
    # meaningless otherwise) ...
    assert ar_exact >= 0.75, (ar_exact, ok_exact)
    # ... and the fast path must match it within 2 points of recall
    # (2 crops of 100 — the same margin the full-scale cross-parity
    # harness holds with measured delta 0.0).
    assert ar_fast >= ar_exact - 0.02 + 1e-9, (
        ar_exact, ar_fast, ok_exact, ok_fast,
    )

    # Per-crop poses agree where both succeeded. Two "correct" poses can sit
    # on opposite sides of GT, so the agreement bound is 2x the success
    # thresholds (rotation 2x5 deg, translation 2x15 mm).
    for i in range(n_crops):
        if ok_exact[i] and ok_fast[i]:
            d_rot = float(
                geometry.rotation_error_deg(out_exact.R_m2c[i], out_fast.R_m2c[i])
            )
            assert d_rot < 10.0, (i, d_rot)
            np.testing.assert_allclose(
                np.asarray(out_exact.t_m2c[i]),
                np.asarray(out_fast.t_m2c[i]),
                atol=0.03,
            )
