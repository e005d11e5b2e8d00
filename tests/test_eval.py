import json

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu.eval import errors as err
from foundpose_tpu.eval.evaluator import EvaluatorPose, write_bop_submission
from foundpose_tpu.structs import PinholeCamera


def identity_syms():
    return np.eye(3)[None].astype(np.float32), np.zeros((1, 3), dtype=np.float32)


def reference_mssd(r_est, t_est, r_gt, t_gt, pts, syms):
    """Literal numpy restatement of the reference (eval_errors.py:12-38)."""
    pts_est = pts @ r_est.T + t_est
    es = []
    for sym in syms:
        r_sym = r_gt @ sym["R"]
        t_sym = r_gt @ sym["t"] + t_gt
        pts_gt = pts @ r_sym.T + t_sym
        es.append(np.linalg.norm(pts_gt - pts_est, axis=1).max())
    return min(es)


def test_mssd_no_symmetry(rng):
    pts = rng.uniform(-50, 50, size=(100, 3)).astype(np.float32)
    r_gt = Rotation.random(random_state=0).as_matrix().astype(np.float32)
    t_gt = np.array([10.0, -5.0, 700.0], dtype=np.float32)
    r_est = (
        r_gt @ Rotation.from_rotvec([0.02, 0, 0]).as_matrix()
    ).astype(np.float32)
    t_est = t_gt + np.array([1.0, 0, 0], dtype=np.float32)
    sr, st = identity_syms()
    got = float(
        err.mssd(
            jnp.asarray(r_est), jnp.asarray(t_est), jnp.asarray(r_gt),
            jnp.asarray(t_gt), jnp.asarray(pts), jnp.asarray(sr), jnp.asarray(st),
        )[0]
    )
    exp = reference_mssd(
        r_est, t_est, r_gt, t_gt, pts, [{"R": np.eye(3), "t": np.zeros(3)}]
    )
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_mssd_symmetry_aware(rng):
    """A 180-deg symmetric object: estimating the flipped pose gives ~0 error."""
    pts = rng.uniform(-50, 50, size=(60, 3)).astype(np.float32)
    flip = Rotation.from_rotvec([0, 0, np.pi]).as_matrix().astype(np.float32)
    r_gt = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    t_gt = np.array([0.0, 0.0, 500.0], dtype=np.float32)
    r_est = (r_gt @ flip).astype(np.float32)

    sr = np.stack([np.eye(3, dtype=np.float32), flip])
    st = np.zeros((2, 3), dtype=np.float32)
    e, _ = err.mssd(
        jnp.asarray(r_est), jnp.asarray(t_gt), jnp.asarray(r_gt), jnp.asarray(t_gt),
        jnp.asarray(pts), jnp.asarray(sr), jnp.asarray(st),
    )
    assert float(e) < 1e-2
    # Without the symmetry it would be large.
    e2, _ = err.mssd(
        jnp.asarray(r_est), jnp.asarray(t_gt), jnp.asarray(r_gt), jnp.asarray(t_gt),
        jnp.asarray(pts), jnp.asarray(sr[:1]), jnp.asarray(st[:1]),
    )
    assert float(e2) > 10.0


def test_mspd_matches_manual(rng):
    pts = rng.uniform(-40, 40, size=(50, 3)).astype(np.float32)
    k = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], dtype=np.float32)
    r_gt = np.eye(3, dtype=np.float32)
    t_gt = np.array([0, 0, 600.0], dtype=np.float32)
    r_est = Rotation.from_rotvec([0, 0.01, 0]).as_matrix().astype(np.float32)
    t_est = t_gt.copy()
    sr, st = identity_syms()
    got = float(
        err.mspd(
            jnp.asarray(r_est), jnp.asarray(t_est), jnp.asarray(r_gt),
            jnp.asarray(t_gt), jnp.asarray(k), jnp.asarray(pts),
            jnp.asarray(sr), jnp.asarray(st),
        )[0]
    )

    def proj(r, t):
        cam = pts @ r.T + t
        uvw = cam @ k.T
        return uvw[:, :2] / uvw[:, 2:3]

    exp = np.linalg.norm(proj(r_est, t_est) - proj(r_gt, t_gt), axis=1).max()
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_evaluator_records_and_json(rng, tmp_path):
    ev = EvaluatorPose([5])
    cam = PinholeCamera.create(f=(600.0, 600.0), c=(320.0, 240.0), width=640, height=480)
    pts = rng.uniform(-30, 30, size=(40, 3)).astype(np.float32)
    r_gt = np.eye(3)
    t_gt = np.array([0, 0, 500.0])
    rec = ev.update(
        scene_id=2, im_id=3, inst_id=0, hypothesis_id=0, obj_id=5,
        R_m2w=r_gt, t_m2w=t_gt,  # identity world == camera
        orig_camera_c2w=cam, score=0.8,
        time_per_inst={"feat": 0.01, "pnp": 0.02},
        R_gt_m2c=r_gt, t_gt_m2c=t_gt, model_pts=pts,
        K=np.asarray(cam.K),
    )
    assert rec.mssd is not None and rec.mssd < 1e-3
    assert rec.mspd is not None and rec.mspd < 1e-3
    assert rec.rotation_err_deg < 1e-3

    path = str(tmp_path / "estimated-poses.json")
    ev.detection_times[(2, 3)] = 0.5
    ev.save_results_json(path)
    data = json.load(open(path))
    assert data[0]["scene_id"] == "2" and data[0]["obj_id"] == "5"
    assert np.asarray(data[0]["R"]).shape == (3, 3)
    assert np.asarray(data[0]["t"]).shape == (3, 1)
    assert data[0]["cnos_time"] == 0.5

    s = ev.summary()
    assert s["num_estimates"] == 1


def test_bop_submission_csv(tmp_path):
    results = {
        5: [
            {
                "scene_id": "2", "img_id": "3", "obj_id": "5", "score": "0.8",
                "R": np.eye(3).tolist(), "t": [[1.0], [2.0], [3.0]],
                "time": {"feat": 0.01, "pnp": 0.02},
            }
        ]
    }
    path = str(tmp_path / "sub.csv")
    write_bop_submission(path, results, detection_times={(2, 3): 0.5})
    lines = open(path).read().split("\n")
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    fields = lines[1].split(",")
    assert fields[:4] == ["2", "3", "5", "0.8"]
    assert len(fields[4].split(" ")) == 9
    assert len(fields[5].split(" ")) == 3
    np.testing.assert_allclose(float(fields[6]), 0.53)


def reference_many_to_many_ratio(dist, ids, valid, radius):
    """Literal loop restatement of the reference's many-to-many inlier ratio
    (reference: utils/eval_util.py:126-150)."""
    ids = np.asarray(ids)[np.asarray(valid, bool)]
    dist = np.asarray(dist)[np.asarray(valid, bool)]
    unique = list(dict.fromkeys(ids.tolist()))
    if not unique:
        return 0.0
    hits = np.zeros(len(unique))
    for i, uid in enumerate(unique):
        sel = np.where(ids == uid)[0]
        if np.sum(dist[sel] <= radius) > 0:
            hits[i] = 1
    return float(np.mean(hits))


def test_many_to_many_inlier_ratio_matches_reference_loop(rng):
    from foundpose_tpu.eval.evaluator import many_to_many_inlier_ratio

    for _ in range(5):
        n = 200
        ids = rng.integers(0, 60, size=n)
        dist = rng.uniform(0, 30, size=n)
        valid = rng.uniform(size=n) > 0.3
        got = many_to_many_inlier_ratio(dist, ids, valid, 10.0)
        exp = reference_many_to_many_ratio(dist, ids, valid, 10.0)
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_evaluator_full_accumulators(rng, tmp_path):
    """All reference accumulators (eval_util.py:26-229) populate and export."""
    ev = EvaluatorPose([5])
    cam = PinholeCamera.create(
        f=(600.0, 600.0), c=(320.0, 240.0), width=640, height=480
    )
    pts = rng.uniform(-30, 30, size=(40, 3)).astype(np.float32)
    r_gt = np.eye(3)
    t_gt = np.array([0, 0, 500.0])

    # Correspondences: 3D points at GT pose project exactly onto coord_2d, so
    # every valid correspondence is an inlier under both GT and the (equal)
    # estimate.
    c3d = rng.uniform(-20, 20, size=(50, 3))
    cam_pts = c3d @ r_gt.T + t_gt
    c2d = cam_pts[:, :2] / cam_pts[:, 2:3] * 600.0 + np.array([320.0, 240.0])
    ids = rng.integers(0, 30, size=50)
    valid = np.ones(50, bool)
    valid[45:] = False

    rec = ev.update(
        scene_id=2, im_id=3, inst_id=0, hypothesis_id=0, obj_id=5,
        R_m2w=r_gt, t_m2w=t_gt,
        orig_camera_c2w=cam, score=0.8,
        time_per_inst={"feat": 0.01},
        R_gt_m2c=r_gt, t_gt_m2c=t_gt, model_pts=pts,
        K=np.asarray(cam.K),
        camera_c2w=cam,
        corresp={"coord_2d": c2d, "coord_2d_ids": ids, "coord_3d": c3d,
                 "valid": valid},
        object_diameter=100.0,
        retrieved_template_R_m2c=np.stack([r_gt, r_gt @ np.diag([1, -1, -1.0])]),
        mask_iou=0.75,
        inlier_radius=10.0,
    )
    assert rec.inliers_est == 45 and rec.inliers_gt == 45
    assert rec.inliers_est_err == {"10": 1.0}
    assert rec.inliers_gt_err == {"10": 1.0}
    assert rec.mssd_n is not None and rec.mssd_n < 1e-4  # mssd/diameter
    assert rec.mask_iou == 0.75
    assert rec.template_ori_err_deg < 1e-3  # first retrieved template == GT
    assert rec.point_errors is not None and rec.point_errors.shape == (40,)

    # A second, perturbed estimate so percentiles aggregate over >1 record.
    from scipy.spatial.transform import Rotation as _R

    r_est = _R.from_rotvec([0.05, 0, 0]).as_matrix()
    ev.update(
        scene_id=2, im_id=4, inst_id=0, hypothesis_id=0, obj_id=5,
        R_m2w=r_est, t_m2w=t_gt + np.array([5.0, 0, 0]),
        orig_camera_c2w=cam, score=0.4,
        time_per_inst={"feat": 0.01},
        R_gt_m2c=r_gt, t_gt_m2c=t_gt, model_pts=pts,
        K=np.asarray(cam.K),
        camera_c2w=cam,
        corresp={"coord_2d": c2d, "coord_2d_ids": ids, "coord_3d": c3d,
                 "valid": valid},
        object_diameter=100.0,
        inlier_radius=10.0,
    )

    # JSON export carries the reference field names (eval_util.py:336-352).
    ev.detection_times[(2, 3)] = 0.1
    ev.detection_times[(2, 4)] = 0.1
    path = str(tmp_path / "estimated-poses.json")
    ev.save_results_json(path)
    data = json.load(open(path))
    for key in ("mssd", "mspd", "mssd_n", "inliers_gt", "inliers_est",
                "inliers_gt_err", "inliers_est_err", "mask_iou"):
        assert key in data[0], key

    # Reference-layout metric table (eval_util.py:400-516).
    tsv = str(tmp_path / "metrics-table.tsv")
    ev.save_metrics(tsv, inlier_thresh=10.0)
    text = open(tsv).read()
    lines = text.strip().split("\n")
    header = [h.strip() for h in lines[0].split("\t")]
    assert "overall" in header and "pmean" in header
    assert "5" in header  # per-object column
    row_names = [l.split("\t")[0].strip() for l in lines[1:]]
    for name in ("mssd", "mssd_n", "mspd", "inliers_gt", "inliers_est",
                 "Point_p50", "Point_p95", "Rot_p50", "Rot_p95",
                 "Trans_p50", "Trans_p95", "Tpl_ori_err", "num_obj"):
        assert name in row_names, name

    s = ev.summary()
    assert s["num_estimates"] == 2
    assert "inliers_est_err_mean" in s


def test_evaluator_without_gt(rng, tmp_path):
    """GT-less updates (the reference's update_without_anno path,
    eval_util.py:231-300): estimate-side inliers still computed, GT fields
    absent, JSON well-formed."""
    ev = EvaluatorPose([4])
    cam = PinholeCamera.create(
        f=(600.0, 600.0), c=(320.0, 240.0), width=640, height=480
    )
    c3d = rng.uniform(-20, 20, size=(30, 3))
    t_est = np.array([0, 0, 500.0])
    cam_pts = c3d + t_est
    c2d = cam_pts[:, :2] / cam_pts[:, 2:3] * 600.0 + np.array([320.0, 240.0])
    rec = ev.update(
        scene_id=1, im_id=2, inst_id=0, hypothesis_id=0, obj_id=4,
        R_m2w=np.eye(3), t_m2w=t_est,
        orig_camera_c2w=cam, score=0.9, time_per_inst={"t": 0.01},
        camera_c2w=cam,
        corresp={"coord_2d": c2d, "coord_2d_ids": np.arange(30),
                 "coord_3d": c3d, "valid": np.ones(30, bool)},
        inlier_radius=10.0,
    )
    assert rec.inliers_est == 30 and rec.inliers_est_err == {"10": 1.0}
    assert rec.mssd is None and rec.inliers_gt is None

    ev.detection_times[(1, 2)] = 0.0
    path = str(tmp_path / "poses.json")
    ev.save_results_json(path)
    data = json.load(open(path))
    assert "inliers_est" in data[0] and "mssd" not in data[0]
    # The reference-layout table degrades gracefully with GT-less records.
    ev.save_metrics(str(tmp_path / "m.tsv"))
    assert "inliers_est" in open(tmp_path / "m.tsv").read()
