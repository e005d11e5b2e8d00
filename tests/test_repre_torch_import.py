"""Tests importing the reference's torch repre.pth format
(reference writer: utils/repre_util.py:99-141)."""

import numpy as np
import torch

from foundpose_tpu.repre import load_torch_repre


def test_load_torch_repre(tmp_path, rng):
    t, f_per, d, w = 4, 10, 8, 16
    n = t * f_per
    obj = {
        "vertices": torch.from_numpy(rng.normal(size=(n, 3)).astype(np.float32)),
        "feat_vectors": torch.from_numpy(rng.normal(size=(n, d)).astype(np.float32)),
        "feat_to_vertex_ids": torch.arange(n),
        "feat_to_template_ids": torch.from_numpy(np.repeat(np.arange(t), f_per)),
        "feat_cluster_centroids": torch.from_numpy(
            rng.normal(size=(w, d)).astype(np.float32)
        ),
        "feat_cluster_idfs": torch.from_numpy(
            np.abs(rng.normal(size=(w,))).astype(np.float32)
        ),
        "template_descs": torch.from_numpy(
            np.abs(rng.normal(size=(t, w))).astype(np.float32)
        ),
        "feat_opts": {"extractor_name": "dinov2_vits14-reg"},
        "template_desc_opts": {
            "desc_type": "tfidf",
            "tfidf_knn_metric": "l2",
            "tfidf_knn_k": 3,
            "tfidf_soft_assign": False,
            "tfidf_soft_sigma_squared": 10.0,
        },
        "feat_raw_projectors": [
            {
                "mean": torch.zeros(d),
                "components": torch.from_numpy(
                    rng.normal(size=(4, d)).astype(np.float32)
                ),
                "explained_variances": torch.ones(4),
            }
        ],
        "feat_vis_projectors": [],
        "template_cameras_cam_from_model": [
            {
                "f": torch.tensor([600.0, 600.0]),
                "c": torch.tensor([209.5, 209.5]),
                "width": 420,
                "height": 420,
                "T_world_from_eye": torch.eye(4),
            }
            for _ in range(t)
        ],
    }
    path = str(tmp_path / "repre.pth")
    torch.save(obj, path)

    repre = load_torch_repre(path)
    assert repre.feat_vectors.shape == (n, d)
    assert repre.template_descs.shape == (t, w)
    assert repre.num_templates == t
    assert repre.tfidf_config.knn_k == 3
    assert repre.raw_projector is not None
    assert repre.raw_projector.components.shape == (4, d)
    assert repre.extractor_name == "dinov2_vits14-reg"
    assert repre.template_cameras.width == 420
    # Padded banks carry exactly the per-template features.
    assert bool(repre.bank_mask.sum() == n)
    np.testing.assert_allclose(
        np.asarray(repre.bank_feats[0, :f_per]),
        np.asarray(repre.feat_vectors[:f_per]),
    )
