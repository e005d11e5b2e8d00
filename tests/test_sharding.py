"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundpose_tpu.models import dinov2
from foundpose_tpu.parallel import mesh as mesh_mod
from foundpose_tpu.parallel.sharded_inference import make_sharded_step
from foundpose_tpu.pipeline import inference
from foundpose_tpu.structs import PinholeCamera

from test_pipeline import make_synthetic_world, render_synthetic_query


def test_mesh_construction():
    m = mesh_mod.make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "bank")
    m2 = mesh_mod.make_mesh(shape=(4, 2))
    assert m2.devices.shape == (4, 2)


def test_shard_repre_places_bank_arrays(rng):
    m = mesh_mod.make_mesh(shape=(4, 2))
    repre, *_ = make_synthetic_world(rng)
    sharded = mesh_mod.shard_repre(repre, m)
    # Template-major arrays split over bank axis.
    spec = sharded.template_descs.sharding.spec
    assert spec[0] == "bank"
    assert sharded.word_centroids.sharding.spec == ()


def test_sharded_pipeline_matches_single_device(rng):
    """The 8-device shard_map pipeline must recover the same poses as the
    single-device pipeline on identical inputs."""
    m = mesh_mod.make_mesh(shape=(4, 2))
    repre, obj_points, obj_feats, tpl_point_ids = make_synthetic_world(rng)

    fmaps, masks, cams, rs, ts, targets = [], [], [], [], [], []
    for i in range(4):
        target = [2, 5, 1, 6][i]
        fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
            rng, obj_points, obj_feats, tpl_point_ids, target
        )
        fmaps.append(fmap)
        masks.append(mask)
        cams.append(camera)
        rs.append(r_gt)
        ts.append(t_gt)
        targets.append(target)
    cameras = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    fmaps = jnp.asarray(np.stack(fmaps))
    masks = jnp.asarray(np.stack(masks))

    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200
    )

    # Single-device reference result.
    ref = inference.pose_from_features(
        fmaps, masks, cameras, repre, jax.random.PRNGKey(0), config
    )

    # Sharded path consumes crops; emulate by feeding feature maps through a
    # tiny identity-ish path: we test the feature-level stages by building a
    # sharded step around a ViT whose output we bypass — instead, run the
    # sharded retrieval/matching directly via the step on raw crops is
    # exercised in test_graft_entry. Here: shard the repre and verify the
    # sharded retrieval + bank fetch + PnP agree with the reference pipeline
    # using the same feature maps.
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from foundpose_tpu.parallel.sharded_inference import (
        _fetch_banks,
        _retrieve_sharded,
    )
    from foundpose_tpu.pipeline.inference import query_features_from_map
    from foundpose_tpu.pose import corresp as corresp_mod
    from foundpose_tpu.pose import pnp as pnp_mod

    sharded_repre = mesh_mod.shard_repre(repre, m)
    tfidf_config = repre.tfidf_config

    def inner(fmaps_l, masks_l, cam_f_l, cam_c_l, descs_l, bf_l, bv_l, bm_l,
              words, idfs, key):
        b_local = fmaps_l.shape[0]
        my_data = jax.lax.axis_index("data")
        keys_all = jax.random.split(key, jax.lax.axis_size("data") * b_local)
        keys = jax.lax.dynamic_slice_in_dim(keys_all, my_data * b_local, b_local)

        def one(fmap, mask, kf, kc, k):
            points, feats, valid = query_features_from_map(
                fmap, mask, (420, 420), 14.0
            )
            validf = valid.astype(feats.dtype)
            tids, tscores = _retrieve_sharded(
                feats, validf, words, idfs, descs_l, 3, tfidf_config
            )
            sf, sv, sm = _fetch_banks(tids, bf_l, bv_l, bm_l)

            def per_template(bfeats, bverts, bmask, kk):
                q_ids, o_ids, _, _, bvalid = corresp_mod.cyclic_buddies(
                    points, feats, valid, bfeats, bmask, 60
                )
                return pnp_mod.ransac_pnp(
                    points[q_ids], bverts[o_ids], bvalid, kf, kc, kk,
                    num_hypotheses=200,
                )

            ks = jax.random.split(k, 3)
            res = jax.vmap(per_template)(sf, sv, sm, ks)
            quality = jnp.where(res.success, res.quality, -1.0)
            best = jnp.argmax(quality)
            return res.success[best], res.R[best], res.t[best], quality[best], tids

        return jax.vmap(one)(fmaps_l, masks_l, cam_f_l, cam_c_l, keys)

    fn = shard_map(
        inner,
        mesh=m,
        in_specs=(
            P("data"), P("data"), P("data"), P("data"),
            P("bank"), P("bank"), P("bank"), P("bank"),
            P(), P(), P(),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    success, r_est, t_est, quality, tids = jax.jit(fn)(
        fmaps, masks, cameras.f, cameras.c,
        sharded_repre.template_descs, sharded_repre.bank_feats,
        sharded_repre.bank_vertices, sharded_repre.bank_mask,
        sharded_repre.word_centroids, sharded_repre.word_idfs,
        jax.random.PRNGKey(0),
    )

    # Retrieval agrees with the single-device pipeline.
    np.testing.assert_array_equal(
        np.sort(np.asarray(tids), axis=1), np.sort(np.asarray(ref.template_ids), axis=1)
    )
    # Poses agree with ground truth (same criteria as the e2e test).
    from foundpose_tpu import geometry

    for i in range(4):
        assert bool(np.asarray(success)[i])
        rot_err = float(geometry.rotation_error_deg(r_est[i], jnp.asarray(rs[i])))
        assert rot_err < 6.0, (i, rot_err)
        np.testing.assert_allclose(np.asarray(t_est[i]), ts[i], atol=0.02)


def test_full_sharded_step_smoke(rng):
    """make_sharded_step compiles and runs image->pose on the 8-device mesh."""
    m = mesh_mod.make_mesh(shape=(4, 2))
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    repre, *_ = make_synthetic_world(rng, feat_dim=32)
    sharded_repre = mesh_mod.shard_repre(repre, m)

    b, hw = 8, 84
    crops = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, hw, hw, 3)).astype(np.float32)),
        mesh_mod.crop_sharding(m),
    )
    masks = jax.device_put(jnp.ones((b, hw, hw)), mesh_mod.crop_sharding(m))
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[100.0, 100.0]]), (b, 1)),
        c=jnp.tile(jnp.asarray([[41.5, 41.5]]), (b, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        width=hw, height=hw,
    )
    config = inference.InferenceConfig(
        crop_size=(hw, hw), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50,
    )
    step = make_sharded_step(m, cfg, config, sharded_repre)
    out = step(params, crops, masks, cameras, jax.random.PRNGKey(1))
    assert out.R_m2c.shape == (b, 3, 3)
    assert np.isfinite(np.asarray(out.t_m2w)).all()


# The two-phase-solve variant runs as a SEPARATE slow-marked test below:
# parametrizing this one doubled the heavy image-level compiles inside the
# main suite process and XLA:CPU's compiler segfaulted under the
# accumulated full-suite compile load (flaky, full-suite-context only —
# the identical test passes standalone and in suite segments). Slow tests
# run in their own pytest invocation, i.e. a fresh process.
def _check_image_level_equivalence(rng, select_iter):
    """Shared body: make_sharded_step must agree with the single-device
    jit_pose_from_crops on identical crops + key. The solve policy
    (winner-only LM), query subsampling, and PRNG key derivation are unified
    across pipeline variants, so the only remaining difference is f32
    reduction order (per-shard ViT batches + psum bank fetch).

    select_iter=20 additionally pins the TWO-PHASE solve
    (inference.full_budget_winner) to the same cross-variant contract."""
    m = mesh_mod.make_mesh(shape=(4, 2))
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    repre, *_ = make_synthetic_world(rng, feat_dim=32)
    sharded_repre = mesh_mod.shard_repre(repre, m)

    b, hw = 8, 84
    crops_np = rng.uniform(size=(b, hw, hw, 3)).astype(np.float32)
    masks_np = np.ones((b, hw, hw), np.float32)
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[100.0, 100.0]]), (b, 1)),
        c=jnp.tile(jnp.asarray([[41.5, 41.5]]), (b, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        width=hw, height=hw,
    )
    config = inference.InferenceConfig(
        crop_size=(hw, hw), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50, pnp_select_iter=select_iter,
    )

    single = inference.jit_pose_from_crops(cfg, config)
    ref = single(
        params, jnp.asarray(crops_np), jnp.asarray(masks_np), cameras, repre,
        jax.random.PRNGKey(1),
    )

    step = make_sharded_step(m, cfg, config, sharded_repre)
    crops = jax.device_put(jnp.asarray(crops_np), mesh_mod.crop_sharding(m))
    masks = jax.device_put(jnp.asarray(masks_np), mesh_mod.crop_sharding(m))
    out = step(params, crops, masks, cameras, jax.random.PRNGKey(1))

    np.testing.assert_array_equal(
        np.sort(np.asarray(out.template_ids), axis=1),
        np.sort(np.asarray(ref.template_ids), axis=1),
    )
    np.testing.assert_array_equal(
        np.asarray(out.best_template), np.asarray(ref.best_template)
    )
    np.testing.assert_allclose(
        np.asarray(out.quality), np.asarray(ref.quality), atol=1.0
    )
    np.testing.assert_allclose(
        np.asarray(out.R_m2c), np.asarray(ref.R_m2c), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.t_m2c), np.asarray(ref.t_m2c), rtol=5e-3, atol=5e-3
    )


def test_sharded_step_matches_single_device_image_level(rng):
    _check_image_level_equivalence(rng, select_iter=0)


@pytest.mark.slow
def test_sharded_step_matches_single_device_two_phase_solve(rng):
    _check_image_level_equivalence(rng, select_iter=20)


def test_sharded_step_hlo_has_expected_collectives(rng):
    """The compiled multi-chip program's communication schedule is asserted,
    not assumed: the bank-sharded retrieval must lower to cross-bank
    collectives (all-reduce/psum for the tf-idf similarity + bank fetch,
    all-gather or reduce-scatter variants allowed for the top-k merge), and
    they must ride the mesh (no point-to-point host transfers)."""
    m = mesh_mod.make_mesh(shape=(4, 2))
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    repre, *_ = make_synthetic_world(rng, feat_dim=32)
    sharded_repre = mesh_mod.shard_repre(repre, m)

    b, hw = 8, 84
    crops = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, hw, hw, 3)).astype(np.float32)),
        mesh_mod.crop_sharding(m),
    )
    masks = jax.device_put(jnp.ones((b, hw, hw)), mesh_mod.crop_sharding(m))
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[100.0, 100.0]]), (b, 1)),
        c=jnp.tile(jnp.asarray([[41.5, 41.5]]), (b, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        width=hw, height=hw,
    )
    config = inference.InferenceConfig(
        crop_size=(hw, hw), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50,
    )
    step = make_sharded_step(m, cfg, config, sharded_repre)
    # step is a jitted callable; lower + compile and inspect optimized HLO.
    lowered = step.lower(params, crops, masks, cameras, jax.random.PRNGKey(1))
    hlo = lowered.compile().as_text()

    n_all_reduce = hlo.count("all-reduce")
    n_all_gather = hlo.count("all-gather") + hlo.count("all-to-all")
    # psum over the bank axis appears at least twice: tf-idf template
    # similarity merge (_retrieve_sharded) and the masked bank fetch
    # (_fetch_banks psum x3 fuses into >=1 all-reduce).
    assert n_all_reduce >= 2, f"expected >=2 all-reduce ops, HLO has {n_all_reduce}"
    # Top-n template-id merge across bank shards needs a gather-style
    # collective (XLA may also implement it via all-reduce; accept either
    # but require SOME cross-device op beyond the minimum).
    assert n_all_reduce + n_all_gather >= 3, (n_all_reduce, n_all_gather)
    # No send/recv point-to-point fallbacks.
    assert "send(" not in hlo and "recv(" not in hlo


def test_multi_object_sharded_step(rng):
    """Mixed-object batches over the bank-sharded mesh: crops of different
    objects share one step, each retrieving from ITS object's sharded bank;
    results must match the single-device multi-object pipeline."""
    from foundpose_tpu.parallel.sharded_inference import make_sharded_step_multi
    from foundpose_tpu.pipeline.multi_object import pose_from_features_multi
    from foundpose_tpu.repre import stack_repres

    m = mesh_mod.make_mesh(shape=(4, 2))
    # Two distinct synthetic objects (different worlds).
    rng2 = np.random.default_rng(7)
    repre_a, pts_a, feats_a, tpl_a = make_synthetic_world(rng)
    repre_b, pts_b, feats_b, tpl_b = make_synthetic_world(rng2)
    multi = stack_repres([repre_a, repre_b])
    multi_sharded = mesh_mod.shard_repre_multi(multi, m)

    # 4 crops: objects [0, 1, 0, 1].
    worlds = [(pts_a, feats_a, tpl_a), (pts_b, feats_b, tpl_b)]
    rngs = [rng, rng2]
    fmaps, masks, cams = [], [], []
    obj_idx = [0, 1, 0, 1]
    targets = [2, 5, 4, 1]
    for oi, tgt in zip(obj_idx, targets):
        fmap, mask, camera, r_gt, t_gt = render_synthetic_query(
            rngs[oi], *worlds[oi], tgt
        )
        fmaps.append(fmap)
        masks.append(mask)
        cams.append(camera)
    cameras = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    fmaps = jnp.asarray(np.stack(fmaps))
    masks = jnp.asarray(np.stack(masks))
    obj_idx_arr = jnp.asarray(obj_idx, dtype=jnp.int32)

    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200
    )
    # Single-device multi-object reference result (feature-level entry).
    ref = pose_from_features_multi(
        fmaps, masks, cameras, obj_idx_arr, multi, jax.random.PRNGKey(0), config
    )

    # Sharded multi-object step consumes crops (images); to compare the
    # feature-level stages, drive its shard_map through a tiny ViT is
    # unnecessary — instead check retrieval + pose agreement by running the
    # full image step on feature-shaped inputs is not possible, so assert
    # the sharded step at the image level separately (smoke below) and the
    # retrieval here through the same helpers:
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from foundpose_tpu.parallel.sharded_inference import (
        _fetch_banks,
        _retrieve_sharded,
    )
    from foundpose_tpu.pipeline.inference import query_features_from_map

    def inner(fmaps_l, masks_l, oi_l, descs_l, tmask_l, words, idfs):
        def one(fmap, mask, oi):
            _, feats, valid = query_features_from_map(fmap, mask, (420, 420), 14.0)
            validf = valid.astype(feats.dtype)
            tids, tscores = _retrieve_sharded(
                feats, validf, words[oi], idfs[oi], descs_l[oi], 3,
                multi.tfidf_config, template_mask_local=tmask_l[oi],
            )
            return tids, tscores

        return jax.vmap(one)(fmaps_l, masks_l, oi_l)

    tmask = multi.template_mask
    if tmask is None:
        tmask = jnp.ones(multi.template_descs.shape[:2], bool)
    fn = shard_map(
        inner, mesh=m,
        in_specs=(P("data"), P("data"), P("data"),
                  P(None, "bank"), P(None, "bank"), P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    tids, tscores = jax.jit(fn)(
        fmaps, masks, obj_idx_arr,
        multi_sharded.template_descs, jax.device_put(
            tmask, jax.sharding.NamedSharding(m, P(None, "bank"))
        ),
        multi_sharded.word_centroids, multi_sharded.word_idfs,
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(tids), axis=1),
        np.sort(np.asarray(ref.template_ids), axis=1),
    )


def test_multi_object_sharded_step_image_level(rng):
    """make_sharded_step_multi compiles and runs images->poses for a mixed
    2-object batch on the 8-device mesh."""
    from foundpose_tpu.parallel.sharded_inference import make_sharded_step_multi
    from foundpose_tpu.repre import stack_repres

    m = mesh_mod.make_mesh(shape=(4, 2))
    cfg = dinov2.DinoV2Config(
        variant="vits14", embed_dim=32, depth=2, num_heads=2, mlp_ratio=4.0,
        swiglu=False, patch_size=14, num_register_tokens=4, pos_grid=6,
        stride=14, facet="token", layer=1, apply_norm=True,
    )
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)
    rng2 = np.random.default_rng(3)
    repre_a, *_ = make_synthetic_world(rng, feat_dim=32)
    repre_b, *_ = make_synthetic_world(rng2, feat_dim=32, num_templates=6)
    multi = stack_repres([repre_a, repre_b])
    multi_sharded = mesh_mod.shard_repre_multi(multi, m)

    b, hw = 8, 84
    crops = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, hw, hw, 3)).astype(np.float32)),
        mesh_mod.crop_sharding(m),
    )
    masks = jax.device_put(jnp.ones((b, hw, hw)), mesh_mod.crop_sharding(m))
    obj_idx = jax.device_put(
        jnp.asarray([0, 1] * 4, dtype=jnp.int32), mesh_mod.crop_sharding(m)
    )
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[100.0, 100.0]]), (b, 1)),
        c=jnp.tile(jnp.asarray([[41.5, 41.5]]), (b, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        width=hw, height=hw,
    )
    config = inference.InferenceConfig(
        crop_size=(hw, hw), grid_cell_size=14.0, top_n_templates=2,
        top_k_buddies=16, pnp_ransac_iter=50,
    )
    step = make_sharded_step_multi(m, cfg, config, multi_sharded)
    out = step(params, crops, masks, cameras, obj_idx, jax.random.PRNGKey(1))
    assert out.R_m2c.shape == (b, 3, 3)
    assert np.isfinite(np.asarray(out.t_m2w)).all()
