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
