"""End-to-end pipeline tests on synthetic objects with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import geometry
from foundpose_tpu.models import dinov2
from foundpose_tpu.ops.tfidf import TfidfConfig
from foundpose_tpu.pipeline import inference
from foundpose_tpu.repre import load_repre, make_repre, save_repre
from foundpose_tpu.structs import PinholeCamera


def make_synthetic_world(rng, num_templates=8, pts_per_template=64, feat_dim=32,
                         num_words=None):
    """Object = 3D point cloud where each point has a unique descriptor.

    Each template sees a subset of the points. Queries built from a GT pose
    reuse the exact descriptors, so the pipeline must retrieve the right
    template, match points 1:1, and recover the pose via PnP.
    """
    n_points = 200
    obj_points = rng.uniform(-0.08, 0.08, size=(n_points, 3)).astype(np.float32)
    obj_feats = rng.normal(size=(n_points, feat_dim)).astype(np.float32) * 3.0

    feat_vectors, vertices, tpl_ids = [], [], []
    tpl_point_ids = []
    for t in range(num_templates):
        sel = rng.choice(n_points, size=pts_per_template, replace=False)
        tpl_point_ids.append(sel)
        feat_vectors.append(obj_feats[sel])
        vertices.append(obj_points[sel])
        tpl_ids.append(np.full(pts_per_template, t))
    feat_vectors = np.concatenate(feat_vectors)
    vertices = np.concatenate(vertices)
    tpl_ids = np.concatenate(tpl_ids).astype(np.int32)

    # Codebook: k-means-free stand-in — one word per object point, so word
    # occupancy differs between templates and idfs are discriminative (as with
    # the real 2048-word codebook over ~300 feats/template).
    if num_words is None:
        num_words = n_points
    words = obj_feats[rng.choice(n_points, size=num_words, replace=False)]
    words = words + 0.01 * rng.normal(size=words.shape).astype(np.float32)

    from foundpose_tpu.ops import tfidf as tfidf_mod

    cfg = TfidfConfig(knn_k=3)
    descs, idfs = tfidf_mod.calc_template_tfidf_descriptors(
        jnp.asarray(feat_vectors), jnp.asarray(tpl_ids), jnp.asarray(words),
        num_templates, cfg,
    )
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (num_templates, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (num_templates, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (num_templates, 1, 1)),
        width=420,
        height=420,
    )
    repre = make_repre(
        feat_vectors=feat_vectors,
        vertices=vertices,
        feat_to_template_ids=tpl_ids,
        word_centroids=np.asarray(words),
        word_idfs=np.asarray(idfs),
        template_descs=np.asarray(descs),
        template_cameras=cameras,
        tfidf_config=cfg,
    )
    return repre, obj_points, obj_feats, tpl_point_ids


def render_synthetic_query(rng, obj_points, obj_feats, tpl_point_ids, target_tpl,
                           crop_size=(420, 420), cell=14.0):
    """Builds a feature map + mask for a crop viewing the object under a GT pose."""
    r_gt = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix().astype(np.float32)
    t_gt = np.array([0.0, 0.0, 0.5], dtype=np.float32)
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

    # Place each projected point's descriptor in its grid cell; the mask
    # covers exactly those cells so every valid query is a true descriptor.
    c = int(cell)
    for p, f in zip(proj, feats):
        cx = int(p[0] // cell)
        cy = int(p[1] // cell)
        if 0 <= cx < gw and 0 <= cy < gh:
            fmap[cy, cx] = f
            mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    camera = PinholeCamera(
        f=jnp.asarray(k_f), c=jnp.asarray(k_c),
        T_world_from_eye=jnp.eye(4), width=420, height=420,
    )
    return fmap, mask, camera, r_gt, t_gt


def test_pose_from_features_recovers_gt(rng):
    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(rng)
    fmaps, masks, rs, ts = [], [], [], []
    cam_list = []
    for target in [2, 5]:
        fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
            rng, obj_points, obj_feats, tpl_point_ids, target
        )
        fmaps.append(fmap)
        masks.append(mask)
        cam_list.append(camera)
        rs.append(r_gt)
        ts.append(t_gt)
    cameras = jax.tree.map(lambda *x: jnp.stack(x), *cam_list)

    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200
    )
    out = inference.pose_from_features(
        jnp.asarray(np.stack(fmaps)),
        jnp.asarray(np.stack(masks)),
        cameras,
        repre,
        jax.random.PRNGKey(0),
        config,
    )
    for i, (target, r_gt, t_gt) in enumerate(zip([2, 5], rs, ts)):
        assert bool(np.asarray(out.success)[i])
        # GT pose recovered up to the +-7 px grid-cell quantization of the
        # synthetic query points.
        rot_err = float(geometry.rotation_error_deg(out.R_m2c[i], jnp.asarray(r_gt)))
        assert rot_err < 6.0, rot_err
        np.testing.assert_allclose(np.asarray(out.t_m2c[i]), t_gt, atol=0.02)
        # With identity crop-camera extrinsics, world pose == camera pose.
        np.testing.assert_allclose(
            np.asarray(out.R_m2w[i]), np.asarray(out.R_m2c[i]), atol=1e-5
        )
        # The target template should be among the retrieved ones.
        assert target in np.asarray(out.template_ids)[i].tolist()


def test_pose_from_crops_smoke(rng):
    """Full image->pose path compiles and runs with a tiny random ViT."""
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    repre, *_ = make_synthetic_world(rng, feat_dim=32)

    b, hw = 2, 84  # 6x6 patches
    crops = jnp.asarray(rng.uniform(size=(b, hw, hw, 3)).astype(np.float32))
    masks = jnp.ones((b, hw, hw), dtype=jnp.float32)
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[100.0, 100.0]]), (b, 1)),
        c=jnp.tile(jnp.asarray([[41.5, 41.5]]), (b, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        width=hw,
        height=hw,
    )
    config = inference.InferenceConfig(
        crop_size=(hw, hw), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50,
    )
    step = inference.jit_pose_from_crops(cfg, config)
    out = step(params, crops, masks, cameras, repre, jax.random.PRNGKey(1))
    assert out.R_m2c.shape == (b, 3, 3)
    assert out.template_ids.shape == (b, 2)
    assert np.isfinite(np.asarray(out.t_m2w)).all()


def test_repre_save_load_roundtrip(rng, tmp_path):
    repre, *_ = make_synthetic_world(rng)
    save_repre(repre, str(tmp_path))
    back = load_repre(str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(back.feat_vectors), np.asarray(repre.feat_vectors)
    )
    np.testing.assert_allclose(
        np.asarray(back.template_descs), np.asarray(repre.template_descs), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(back.bank_mask), np.asarray(repre.bank_mask))
    assert back.tfidf_config == repre.tfidf_config
    assert back.template_cameras.width == 420


def test_pose_from_features_bench_config(rng):
    """The bench configuration (bf16 compute + approximate top-k) still
    recovers the GT pose on the synthetic world."""
    import jax.numpy as jnp2

    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(rng)
    fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
        rng, obj_points, obj_feats, tpl_point_ids, 3
    )
    cameras = jax.tree.map(lambda *x: jnp.stack(x), camera)
    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200,
        compute_dtype=jnp2.bfloat16, approx_topk=True,
    )
    out = inference.pose_from_features(
        jnp.asarray(fmap)[None], jnp.asarray(mask)[None], cameras, repre,
        jax.random.PRNGKey(0), config,
    )
    assert bool(out.success[0])
    rot_err = float(geometry.rotation_error_deg(out.R_m2c[0], jnp.asarray(r_gt)))
    assert rot_err < 8.0, rot_err
    np.testing.assert_allclose(np.asarray(out.t_m2c[0]), t_gt, atol=0.03)


# (A Pallas dual-argmin buddies kernel existed in round 1 but measured slower
# than XLA's fused distance-matrix path end-to-end, so it was removed; see
# pose/corresp.py:establish_correspondences_batch.)


def test_cast_banks_bf16_pipeline(rng):
    """bf16 banks at rest: pipeline runs and recovers GT with the repre's
    heavy arrays stored in bfloat16."""
    import jax.numpy as jnp2

    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(rng)
    repre16 = repre.cast_banks(jnp2.bfloat16)
    assert repre16.bank_feats.dtype == jnp2.bfloat16
    assert repre16.template_descs.dtype == jnp2.bfloat16
    assert repre16.bank_vertices.dtype == repre.bank_vertices.dtype  # geometry f32

    fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
        rng, obj_points, obj_feats, tpl_point_ids, 4
    )
    cameras = jax.tree.map(lambda *x: jnp.stack(x), camera)
    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200,
        compute_dtype=jnp2.bfloat16,
    )
    out = inference.pose_from_features(
        jnp.asarray(fmap)[None], jnp.asarray(mask)[None], cameras, repre16,
        jax.random.PRNGKey(0), config,
    )
    assert bool(out.success[0])
    rot_err = float(geometry.rotation_error_deg(out.R_m2c[0], jnp.asarray(r_gt)))
    assert rot_err < 8.0, rot_err
    np.testing.assert_allclose(np.asarray(out.t_m2c[0]), t_gt, atol=0.03)


def test_registration_mask_from_depth_matches_explicit(rng):
    """The lean-upload registration variant (mask derived on device as
    depth > 0, depth shipped as raw uint16 0.1mm units) must produce the
    same features/vertices/validity as the explicit f32-mask path — the
    two are used interchangeably depending on template provenance
    (gen_repre._load_one_template / "mask_is_depth_positive")."""
    from foundpose_tpu.pipeline.gen_repre import make_registration_fn

    cfg = dinov2.resolve_config(
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=1_norm=0",
        overrides={"embed_dim": 32, "depth": 2, "num_heads": 2, "pos_grid": 10},
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    b, h, w = 2, 70, 70
    images = rng.integers(0, 255, size=(b, h, w, 3)).astype(np.uint8)
    # Quantized depth (multiples of 0.1mm) so uint16 units are exact.
    depth_u16 = np.zeros((b, h, w), np.uint16)
    depth_u16[:, 20:60, 15:55] = rng.integers(
        2500, 3500, size=(b, 40, 40)
    ).astype(np.uint16)
    depth_f32 = depth_u16.astype(np.float32) / 10.0
    masks_f32 = (depth_f32 > 0).astype(np.float32)
    cam_f = np.full((b, 2), 80.0, np.float32)
    cam_c = np.full((b, 2), (w - 1) / 2.0, np.float32)
    cam_t = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4))

    reg_explicit = make_registration_fn(cfg, 14.0, (w, h))
    reg_lean = make_registration_fn(cfg, 14.0, (w, h), mask_from_depth=True)
    f1, v1, m1 = reg_explicit(
        params, jnp.asarray(images), jnp.asarray(depth_f32),
        jnp.asarray(masks_f32), jnp.asarray(cam_f), jnp.asarray(cam_c),
        jnp.asarray(cam_t),
    )
    f2, v2, m2 = reg_lean(
        params, jnp.asarray(images), jnp.asarray(depth_u16), None,
        jnp.asarray(cam_f), jnp.asarray(cam_c), jnp.asarray(cam_t),
    )
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    assert np.asarray(m2).any(), "test must exercise valid grid points"
