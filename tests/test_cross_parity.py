"""Cross-implementation parity at test scale: the reference-style replica
(numpy/sklearn/cv2, per-instance — benchmarks/cross_parity.ReferenceReplica)
must agree with the JAX pipeline at the pose/AR level on a shared structured
synthetic world, and the independently recomputed offline tf-idf artifacts
must match the JAX-built repre. Full LM-O scale runs via
`python benchmarks/cross_parity.py` (results recorded in PARITY.md)."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks"),
)

from cross_parity import run_parity  # noqa: E402


def test_replica_and_jax_agree_at_ar_level():
    # Matching parameters scaled with the world (12 templates / ~100 queries
    # vs LM-O's 798 / ~400), mirroring tests/test_fastpath_ar.py — the
    # published LM-O config (5/300/400) is exercised at full scale by
    # `python benchmarks/cross_parity.py`.
    report = run_parity(
        num_templates=12, pts_per_template=80, feat_dim=48, num_words=200,
        n_points=200, n_crops=12, top_n_templates=3, top_k_buddies=60,
        pnp_ransac_iter=400, verbose=False,
    )
    # Offline leg: idfs and template descriptors recomputed independently
    # match the JAX-built repre.
    assert report["idf_max_delta"] < 1e-5, report
    assert report["template_desc_cosine_min"] > 0.999, report
    # Online leg: AR within one crop on both the exact and the benched fast
    # config, and poses agree where both succeeded.
    one_crop = 1.0 / report["n_crops"] + 1e-9
    assert report["ar_delta_exact"] <= one_crop, report
    assert report["ar_delta_fast"] <= one_crop, report
    # The REAL BOP19 protocol layer (eval/bop_ar.py) scores both sides'
    # poses too — the scorekeeper itself is exercised end to end.
    assert report["bop_ar_replica"] > 0.5, report
    assert report["bop_ar_delta_exact"] <= 0.05, report
    assert report["bop_ar_delta_fast"] <= 0.05, report
    if report["both_succeeded_exact"]:
        assert report["median_rot_delta_deg_exact"] < 10.0, report
        assert report["median_t_delta_mm_exact"] < 30.0, report


def test_featuremetric_refinement_improves_pose_on_subcell_world():
    """Featuremetric refinement (the paper stage absent from the reference
    OSS) must reduce pose error on a world whose feature field carries
    sub-cell signal (bilinearly splatted descriptors — the field class the
    stage exists for). Full-scale characterization:
    benchmarks/results/featuremetric_accuracy_r05.json (recall 0.81 -> 1.00,
    median rot 0.96 -> 0.51 deg, t 9.1 -> 5.3 mm at 100 crops)."""
    from cross_parity import featuremetric_leg

    report = featuremetric_leg(
        n_crops=30, num_templates=24, pts_per_template=120, feat_dim=48,
        num_words=256, n_points=800, verbose=False,
    )
    assert report["n_success_off"] >= 20, report
    assert report["recall_on"] >= report["recall_off"] - 1.0 / 30, report
    assert report["median_rot_err_deg_on"] <= report["median_rot_err_deg_off"], report
    assert report["median_t_err_mm_on"] <= report["median_t_err_mm_off"], report
