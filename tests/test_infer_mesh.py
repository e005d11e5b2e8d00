"""Multi-chip infer CLI (InferOpts.mesh_shape): the sharded step is
reachable from the pipeline surface, on the 8-device virtual CPU mesh."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foundpose_tpu.pipeline import gen_repre as gen_repre_mod
from foundpose_tpu.pipeline import gen_templates as gen_templates_mod
from foundpose_tpu.pipeline import infer as infer_mod

from test_integration import (
    OBJ_ID,
    TINY_EXTRACTOR,
    build_synthetic_bop,
    make_textured_icosahedron,
)

VIT_OVERRIDES = {"embed_dim": 32, "depth": 2, "num_heads": 2, "pos_grid": 10}


def test_pad_templates_masks_pad_rows(rng):
    import __graft_entry__ as ge
    from foundpose_tpu.repre import pad_templates

    repre = ge._realistic_repre(
        rng, num_templates=10, fmax=64, feat_dim=16, num_words=32, raw_dim=32
    )
    padded = pad_templates(repre, 4)
    assert padded.template_descs.shape[0] == 12
    assert padded.bank_feats.shape[0] == 12
    assert padded.template_cameras.f.shape[0] == 12
    mask = np.asarray(padded.template_mask)
    assert mask[:10].all() and not mask[10:].any()
    # Edge-replicated cameras keep valid intrinsics in the pad rows.
    np.testing.assert_array_equal(
        np.asarray(padded.template_cameras.f[10]),
        np.asarray(repre.template_cameras.f[9]),
    )
    # Already-divisible counts pass through (with a mask attached).
    same = pad_templates(repre, 5)
    assert same.template_descs.shape[0] == 10
    assert np.asarray(same.template_mask).all()


@pytest.mark.slow
def test_infer_cli_mesh_shapes(tmp_path):
    """gen_templates -> gen_repre once, then infer over (2,2) and (2,2,2)
    chip meshes: both must recover the GT pose like the single-chip path
    (tests/test_integration.py)."""
    mesh_obj = make_textured_icosahedron()
    bop_root, det_path, r_gt, t_gt = build_synthetic_bop(tmp_path, mesh_obj)

    tpl_opts = gen_templates_mod.GenTemplatesOpts(
        object_dataset="demo", object_lids=[OBJ_ID], min_num_viewpoints=9,
        num_inplane_rotations=4, depth_range=(300.0, 300.0), ssaa_factor=2.0,
        crop_size=(140, 140), bop_root=bop_root,
        output_dir=str(tmp_path / "templates"), overwrite=True,
    )
    gen_templates_mod.synthesize_templates(tpl_opts)
    repre_opts = gen_repre_mod.GenRepreOpts(
        object_dataset="demo", object_lids=[OBJ_ID],
        extractor_name=TINY_EXTRACTOR, apply_pca=True, pca_components=16,
        cluster_num=64, batch_size=8, vit_overrides=VIT_OVERRIDES,
        templates_dir=str(tmp_path / "templates"),
        output_dir=str(tmp_path / "repre"), overwrite=True,
    )
    gen_repre_mod.generate_repre_from_list(repre_opts)

    from scipy.spatial.transform import Rotation  # noqa: F401 (env check)

    for name, shape, multi in (
        ("mesh22", (2, 2), False),
        ("mesh222_tp", (2, 2, 2), False),
        ("mesh22_mo", (2, 2), True),
        # Tensor-parallel x multi-object composition (VERDICT r3
        # directive 4): the ViT model-split serves mixed-object batches.
        ("mesh222_tp_mo", (2, 2, 2), True),
    ):
        infer_opts = infer_mod.InferOpts(
            object_dataset="demo", object_lids=[OBJ_ID],
            extractor_name=TINY_EXTRACTOR, crop_size=(140, 140),
            match_top_n_templates=3, match_top_k_buddies=50,
            pnp_ransac_iter=200, batch_size=2, vit_overrides=VIT_OVERRIDES,
            dataset_crop_size=(224, 224), mesh_shape=shape,
            multi_object=multi, bop_root=bop_root,
            repre_dir=str(tmp_path / "repre"), detections_path=det_path,
            output_dir=str(tmp_path / f"inference_{name}"),
        )
        if multi:
            infer_mod.infer_multi_object(infer_opts)
        else:
            infer_mod.infer(infer_opts)
        results = json.loads(
            (tmp_path / f"inference_{name}" / "demo" / "v1" / str(OBJ_ID)
             / "estimated-poses.json").read_text()
        )
        assert len(results) == 1, name
        r_est = np.asarray(results[0]["R"], dtype=float)
        t_est = np.asarray(results[0]["t"], dtype=float).flatten()
        rot_err = np.degrees(
            np.arccos(np.clip((np.trace(r_est @ r_gt.T) - 1) / 2, -1, 1))
        )
        assert rot_err < 15.0, (name, rot_err)
        assert np.linalg.norm(t_est - t_gt) < 30.0, name


def test_mesh_shape_validation():
    opts = infer_mod.InferOpts(batch_size=3, mesh_shape=(2, 4))
    with pytest.raises(ValueError):
        infer_mod._build_mesh(opts)
