import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu.eval import bop_ar


def make_world(rng, n_gt=20, noise_rot_deg=0.0, miss_frac=0.0):
    pts = rng.uniform(-50, 50, size=(200, 3))
    diameter = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    k = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    gts, ests, intr = [], [], {}
    for i in range(n_gt):
        r = Rotation.random(random_state=i).as_matrix()
        t = np.array([0, 0, 600.0]) + rng.normal(size=3)
        gts.append(bop_ar.GroundTruth(scene_id=1, im_id=i, obj_id=7, R=r, t=t))
        intr[(1, i)] = k
        if rng.uniform() < miss_frac:
            continue
        dr = Rotation.from_rotvec(
            np.deg2rad(noise_rot_deg) * np.array([1.0, 0, 0])
        ).as_matrix()
        ests.append(
            bop_ar.Estimate(scene_id=1, im_id=i, obj_id=7, score=0.9, R=r @ dr, t=t)
        )
    return pts, diameter, k, gts, ests, intr


def test_perfect_estimates_give_ar_one(rng):
    pts, dia, k, gts, ests, intr = make_world(rng)
    out = bop_ar.evaluate_ar(
        ests, gts, {7: pts}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]}, intr
    )
    assert out["ar_mssd"] == 1.0
    assert out["ar_mspd"] == 1.0
    assert out["bop_ar"] == 1.0


def test_missing_estimates_reduce_recall(rng):
    pts, dia, k, gts, ests, intr = make_world(rng, miss_frac=0.5)
    out = bop_ar.evaluate_ar(
        ests, gts, {7: pts}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]}, intr
    )
    frac = len(ests) / len(gts)
    np.testing.assert_allclose(out["ar_mssd"], frac, atol=1e-6)


def test_noisy_estimates_partial_recall(rng):
    pts, dia, k, gts, ests, intr = make_world(rng, noise_rot_deg=8.0)
    out = bop_ar.evaluate_ar(
        ests, gts, {7: pts}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]}, intr
    )
    assert 0.0 < out["ar_mssd"] < 1.0


def test_symmetry_rescues_flipped_estimates(rng):
    pts, dia, k, gts, _, intr = make_world(rng)
    flip = Rotation.from_rotvec([0, 0, np.pi]).as_matrix()
    ests = [
        bop_ar.Estimate(g.scene_id, g.im_id, g.obj_id, 0.9, g.R @ flip, g.t)
        for g in gts
    ]
    syms_id = {7: [(np.eye(3), np.zeros(3))]}
    syms_full = {7: [(np.eye(3), np.zeros(3)), (flip, np.zeros(3))]}
    out_no = bop_ar.evaluate_ar(ests, gts, {7: pts}, {7: dia}, syms_id, intr)
    out_yes = bop_ar.evaluate_ar(ests, gts, {7: pts}, {7: dia}, syms_full, intr)
    assert out_no["ar_mssd"] < 0.3
    assert out_yes["ar_mssd"] == 1.0


def test_vsd_with_rasterizer(rng):
    from foundpose_tpu.data.ply import Mesh
    from foundpose_tpu.renderer.base import RendererType, RenderType, build
    from foundpose_tpu.structs import PinholeCamera

    # Flat quad object.
    v = np.array(
        [[-30, -30, 0], [30, -30, 0], [30, 30, 0], [-30, 30, 0]], dtype=np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    mesh = Mesh(vertices=v, faces=f)
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(7, mesh)
    cam = PinholeCamera.create(f=(300.0, 300.0), c=(63.5, 63.5), width=128, height=128)
    k = np.asarray(cam.K)

    r_gt = np.eye(3)
    t_gt = np.array([0, 0, 400.0])
    # Test depth = perfect GT render.
    t_m2w = np.eye(4)
    t_m2w[:3, 3] = t_gt
    depth_test = np.asarray(
        renderer.render_object_model(7, cam, T_model_to_world=t_m2w)[RenderType.DEPTH]
    )

    gts = [bop_ar.GroundTruth(1, 0, 7, r_gt, t_gt)]
    ests = [bop_ar.Estimate(1, 0, 7, 0.9, r_gt, t_gt)]
    dia = 85.0
    out = bop_ar.evaluate_ar(
        ests, gts, {7: v}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]},
        {(1, 0): k}, depth_images={(1, 0): depth_test}, renderer=renderer,
        cameras={(1, 0): cam},
    )
    assert out["ar_vsd"] == 1.0
    assert out["bop_ar"] == 1.0

    # A badly displaced estimate fails VSD.
    ests_bad = [bop_ar.Estimate(1, 0, 7, 0.9, r_gt, t_gt + np.array([0, 0, 80.0]))]
    out_bad = bop_ar.evaluate_ar(
        ests_bad, gts, {7: v}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]},
        {(1, 0): k}, depth_images={(1, 0): depth_test}, renderer=renderer,
        cameras={(1, 0): cam},
    )
    assert out_bad["ar_vsd"] < 0.5


def test_csv_roundtrip(tmp_path):
    from foundpose_tpu.eval.evaluator import write_bop_submission

    results = {
        5: [
            {
                "scene_id": "2", "img_id": "3", "obj_id": "5", "score": "0.8",
                "R": np.eye(3).tolist(), "t": [[1.0], [2.0], [3.0]],
                "time": {},
            }
        ]
    }
    path = str(tmp_path / "sub.csv")
    write_bop_submission(path, results)
    ests = bop_ar.load_estimates_from_csv(path)
    assert len(ests) == 1
    np.testing.assert_allclose(ests[0].R, np.eye(3))
    np.testing.assert_allclose(ests[0].t, [1, 2, 3])
