import jax
import jax.numpy as jnp
import numpy as np

from foundpose_tpu import geometry
from foundpose_tpu.pipeline import inference
from foundpose_tpu.pipeline.multi_object import pose_from_features_multi
from foundpose_tpu.repre import stack_repres

from test_pipeline import make_synthetic_world, render_synthetic_query


def test_multi_object_batch_matches_single(rng):
    """A mixed batch over two stacked objects recovers each crop's GT pose the
    same way the per-object pipeline does."""
    repre_a, pts_a, feats_a, tpl_ids_a = make_synthetic_world(rng)
    repre_b, pts_b, feats_b, tpl_ids_b = make_synthetic_world(
        rng, num_templates=6, pts_per_template=48
    )
    multi = stack_repres([repre_a, repre_b])
    assert multi.bank_feats.shape[0] == 2
    assert multi.template_mask is not None
    assert bool(multi.template_mask[0].all())
    assert int(multi.template_mask[1].sum()) == 6

    fmap_a, mask_a, cam_a, r_a, t_a = render_synthetic_query(
        rng, pts_a, feats_a, tpl_ids_a, 2
    )
    fmap_b, mask_b, cam_b, r_b, t_b = render_synthetic_query(
        rng, pts_b, feats_b, tpl_ids_b, 4
    )
    cameras = jax.tree.map(lambda *x: jnp.stack(x), cam_a, cam_b)
    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200
    )
    out = pose_from_features_multi(
        jnp.asarray(np.stack([fmap_a, fmap_b])),
        jnp.asarray(np.stack([mask_a, mask_b])),
        cameras,
        jnp.asarray([0, 1]),
        multi,
        jax.random.PRNGKey(0),
        config,
    )
    assert bool(out.success[0]) and bool(out.success[1])
    assert float(geometry.rotation_error_deg(out.R_m2c[0], jnp.asarray(r_a))) < 6.0
    assert float(geometry.rotation_error_deg(out.R_m2c[1], jnp.asarray(r_b))) < 8.0
    np.testing.assert_allclose(np.asarray(out.t_m2c[0]), t_a, atol=0.02)
    np.testing.assert_allclose(np.asarray(out.t_m2c[1]), t_b, atol=0.02)
    # Padded templates of object B are never retrieved.
    assert np.asarray(out.template_ids[1]).max() < 6


def test_multi_object_is_exact_generalization_of_single(rng):
    """With one stacked object and the same key, pose_from_features_multi must
    reproduce inference.pose_from_features to numerical precision: the solve
    policy (winner-only LM), query subsampling, and PRNG key derivation are
    unified across all pipeline variants, so identical inputs draw identical
    RANSAC hypotheses and refine identically."""
    repre, pts, feats, tpl_ids = make_synthetic_world(rng)
    multi = stack_repres([repre])

    fmaps, masks, cams = [], [], []
    for tgt in (2, 5):
        fmap, mask, cam, _, _ = render_synthetic_query(
            rng, pts, feats, tpl_ids, tgt
        )
        fmaps.append(fmap)
        masks.append(mask)
        cams.append(cam)
    cameras = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    fmaps = jnp.asarray(np.stack(fmaps))
    masks = jnp.asarray(np.stack(masks))
    config = inference.InferenceConfig(
        top_n_templates=3, top_k_buddies=60, pnp_ransac_iter=200
    )

    ref = inference.pose_from_features(
        fmaps, masks, cameras, repre, jax.random.PRNGKey(0), config
    )
    out = pose_from_features_multi(
        fmaps, masks, cameras, jnp.zeros((2,), jnp.int32), multi,
        jax.random.PRNGKey(0), config,
    )
    np.testing.assert_array_equal(
        np.asarray(out.template_ids), np.asarray(ref.template_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(out.best_template), np.asarray(ref.best_template)
    )
    np.testing.assert_array_equal(np.asarray(out.quality), np.asarray(ref.quality))
    np.testing.assert_allclose(
        np.asarray(out.R_m2c), np.asarray(ref.R_m2c), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.t_m2c), np.asarray(ref.t_m2c), atol=1e-4
    )
