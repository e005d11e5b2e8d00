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


# ---------------------------------------------------------------------------
# Literal restatement oracle of the bop_toolkit BOP19 protocol
# (pose_matching.match_poses + eval_calc_scores flow), kept deliberately
# loop-based and dictionary-shaped like the toolkit, so it can disagree
# with the vectorized implementation in eval/bop_ar.py.
# ---------------------------------------------------------------------------


def oracle_match_poses(errs_by_est, error_th):
    """bop_toolkit pose_matching.match_poses: estimates in score-descending
    order greedily claim the unmatched GT with the lowest error, provided
    the error is below the threshold."""
    matches = []
    gt_matched = set()
    for est_id, errs in enumerate(errs_by_est):
        best_gt_id = -1
        best_error = float("inf")
        for gt_id, error in errs.items():
            if gt_id in gt_matched:
                continue
            if error < error_th and error < best_error:
                best_gt_id = gt_id
                best_error = error
        if best_gt_id != -1:
            gt_matched.add(best_gt_id)
            matches.append((est_id, best_gt_id))
    return matches


def oracle_evaluate(ests, gts, pts_by_obj, dia_by_obj, syms_by_obj, intr,
                    image_width=640, min_visib=0.1):
    """eval_calc_errors + eval_calc_scores restated: per-(scene,im,obj)
    error dictionaries, then an independent greedy matching per error type
    and per correctness threshold; recall denominators = valid GTs."""

    def mssd(e, g, pts, syms):
        best = float("inf")
        for sr, st in syms:
            d = 0.0
            for p in pts:
                pe = e.R @ p + e.t
                pg = (g.R @ sr) @ p + g.R @ st + g.t
                d = max(d, float(np.linalg.norm(pe - pg)))
            best = min(best, d)
        return best

    def mspd(e, g, k, pts, syms):
        def px(r, t, p):
            c = r @ p + t
            u = k @ c
            return u[:2] / u[2]

        best = float("inf")
        for sr, st in syms:
            d = 0.0
            for p in pts:
                d = max(d, float(np.linalg.norm(
                    px(e.R, e.t, p) - px(g.R @ sr, g.R @ st + g.t, p))))
            best = min(best, d)
        return best

    groups = {}
    for g in gts:
        if g.visib_fract < min_visib:
            continue
        groups.setdefault((g.scene_id, g.im_id, g.obj_id), {"gt": [], "est": []})
        groups[(g.scene_id, g.im_id, g.obj_id)]["gt"].append(g)
    for e in ests:
        key = (e.scene_id, e.im_id, e.obj_id)
        if key in groups:
            groups[key]["est"].append(e)

    mssd_ths = [0.05 * (i + 1) for i in range(10)]
    mspd_ths = [5.0 * (i + 1) * image_width / 640.0 for i in range(10)]
    n_total = sum(len(v["gt"]) for v in groups.values())
    recalls_mssd, recalls_mspd = [], []
    for kind, ths in (("mssd", mssd_ths), ("mspd", mspd_ths)):
        for th in ths:
            n_matched = 0
            for (sid, iid, oid), grp in groups.items():
                n_top = len(grp["gt"])
                est_sorted = sorted(grp["est"], key=lambda e: e.score,
                                    reverse=True)[:n_top]
                errs_by_est = []
                for e in est_sorted:
                    errs = {}
                    for gt_id, g in enumerate(grp["gt"]):
                        if kind == "mssd":
                            errs[gt_id] = mssd(e, g, pts_by_obj[oid],
                                               syms_by_obj[oid])
                        else:
                            errs[gt_id] = mspd(e, g, intr[(sid, iid)],
                                               pts_by_obj[oid],
                                               syms_by_obj[oid])
                    errs_by_est.append(errs)
                err_th = th * dia_by_obj[oid] if kind == "mssd" else th
                n_matched += len(oracle_match_poses(errs_by_est, err_th))
            (recalls_mssd if kind == "mssd" else recalls_mspd).append(
                n_matched / n_total
            )
    ar_mssd = sum(recalls_mssd) / len(recalls_mssd)
    ar_mspd = sum(recalls_mspd) / len(recalls_mspd)
    return {"ar_mssd": ar_mssd, "ar_mspd": ar_mspd,
            "bop_ar": (ar_mssd + ar_mspd) / 2.0}


def make_multi_instance_world(seed):
    """Multi-instance scenes: 1-3 GTs per (im, obj), noisy/outlier/extra/
    missing estimates with random scores, 2 objects, one symmetric."""
    rng = np.random.default_rng(seed)
    pts = {
        7: rng.uniform(-40, 40, size=(12, 3)),
        8: rng.uniform(-25, 25, size=(12, 3)),
    }
    dia = {o: float(np.linalg.norm(p.max(0) - p.min(0))) for o, p in pts.items()}
    flip = Rotation.from_rotvec([0, 0, np.pi]).as_matrix()
    syms = {7: [(np.eye(3), np.zeros(3))],
            8: [(np.eye(3), np.zeros(3)), (flip, np.zeros(3))]}
    k = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    gts, ests, intr = [], [], {}
    for im_id in range(6):
        intr[(1, im_id)] = k
        for obj_id in (7, 8):
            n_inst = int(rng.integers(1, 4))
            for j in range(n_inst):
                r = Rotation.random(random_state=100 * im_id + 10 * obj_id + j
                                    ).as_matrix()
                t = np.array([80.0 * j - 80.0, 30.0 * j, 700.0])
                visib = float(rng.uniform(0.0, 1.0))
                gts.append(bop_ar.GroundTruth(1, im_id, obj_id, r, t, visib))
                u = rng.uniform()
                if u < 0.2:
                    continue  # missed instance
                # Noise spanning sub-threshold to way-out-of-threshold.
                ang = float(rng.uniform(0, 40.0))
                dr = Rotation.from_rotvec(
                    np.deg2rad(ang) * np.array([0, 1.0, 0])).as_matrix()
                dt = rng.normal(scale=rng.uniform(0.5, 25.0), size=3)
                ests.append(bop_ar.Estimate(
                    1, im_id, obj_id, float(rng.uniform()), r @ dr, t + dt))
                if u > 0.8:
                    # A spurious extra estimate (exercises top-n truncation).
                    ests.append(bop_ar.Estimate(
                        1, im_id, obj_id, float(rng.uniform()),
                        Rotation.random(random_state=999 + im_id).as_matrix(),
                        t + rng.normal(scale=120.0, size=3)))
    return pts, dia, syms, intr, gts, ests


def test_protocol_matches_restatement_oracle():
    for seed in (0, 1, 2):
        pts, dia, syms, intr, gts, ests = make_multi_instance_world(seed)
        got = bop_ar.evaluate_ar(ests, gts, pts, dia, syms, intr)
        want = oracle_evaluate(ests, gts, pts, dia, syms, intr)
        assert 0.0 < want["ar_mssd"] < 1.0  # non-degenerate world
        np.testing.assert_allclose(got["ar_mssd"], want["ar_mssd"], atol=1e-12)
        np.testing.assert_allclose(got["ar_mspd"], want["ar_mspd"], atol=1e-12)
        np.testing.assert_allclose(got["bop_ar"], want["bop_ar"], atol=1e-12)


def test_per_threshold_matching_releases_gt_for_lower_scored_estimate():
    """BOP19 matching is per threshold: a high-scored estimate whose error
    exceeds the threshold must NOT block the GT it would claim at a looser
    threshold. Identity rotations + pure-translation offsets make MSSD
    exactly |t_est - t_gt|."""
    pts = {7: np.array([[0.0, 0, 0], [1, 0, 0]])}
    dia = {7: 100.0}
    syms = {7: [(np.eye(3), np.zeros(3))]}
    k = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    eye = np.eye(3)
    z = np.array([0.0, 0.0, 1000.0])
    gts = [
        bop_ar.GroundTruth(1, 0, 7, eye, z + np.array([0.0, 0, 0])),
        bop_ar.GroundTruth(1, 0, 7, eye, z + np.array([100.0, 0, 0])),
    ]
    ests = [
        # score 0.9: 45 mm from GT0, 55 mm from GT1.
        bop_ar.Estimate(1, 0, 7, 0.9, eye, z + np.array([45.0, 0, 0])),
        # score 0.5: 8 mm from GT0.
        bop_ar.Estimate(1, 0, 7, 0.5, eye, z + np.array([8.0, 0, 0])),
    ]
    intr = {(1, 0): k}
    got = bop_ar.evaluate_ar(ests, gts, pts, dia, syms, intr)
    # theta=0.05: nothing (8 > 5). theta in 0.10..0.45: est2 matches GT0
    # (est1's 45/55 are over threshold until 0.5 so it must not block).
    # theta=0.50: est1 (higher score) claims GT0 at error 45; est2 is left
    # with GT1 at 92 > 50 -> still exactly one match.
    want = np.mean([0.0] + [0.5] * 9)
    np.testing.assert_allclose(got["ar_mssd"], want, atol=1e-12)
    # The oracle agrees.
    want_oracle = oracle_evaluate(ests, gts, pts, dia, syms, intr)["ar_mssd"]
    np.testing.assert_allclose(got["ar_mssd"], want_oracle, atol=1e-12)


def test_vsd_matches_restatement_oracle(rng):
    """BOP19 VSD restated: distance images, bop19 visibility masks, step
    costs per tau, per-(tau, theta) matching — against the implementation,
    on real rasterizer renders."""
    from foundpose_tpu.data.ply import Mesh
    from foundpose_tpu.renderer.base import RendererType, RenderType, build
    from foundpose_tpu.structs import PinholeCamera

    v = np.array(
        [[-30, -30, 0], [30, -30, 0], [30, 30, 0], [-30, 30, 0]],
        dtype=np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(7, Mesh(vertices=v, faces=f))
    cam = PinholeCamera.create(f=(300.0, 300.0), c=(63.5, 63.5),
                               width=128, height=128)
    k = np.asarray(cam.K)
    dia = 85.0

    def render_depth(r, t):
        t_m2w = np.eye(4)
        t_m2w[:3, :3] = r
        t_m2w[:3, 3] = t
        out = renderer.render_object_model(
            7, cam, T_model_to_world=np.asarray(cam.T_world_from_eye) @ t_m2w)
        return np.asarray(out[RenderType.DEPTH], dtype=np.float64)

    r_gt = Rotation.from_rotvec([0.3, 0.1, 0]).as_matrix()
    t_gt = np.array([5.0, -3.0, 420.0])
    depth_test = render_depth(r_gt, t_gt)
    # Slightly-off estimate: partial VSD error across the tau grid.
    r_est = r_gt @ Rotation.from_rotvec([0.0, 0.12, 0]).as_matrix()
    t_est = t_gt + np.array([2.0, 1.0, 9.0])

    gts = [bop_ar.GroundTruth(1, 0, 7, r_gt, t_gt)]
    ests = [bop_ar.Estimate(1, 0, 7, 0.9, r_est, t_est)]
    got = bop_ar.evaluate_ar(
        ests, gts, {7: v}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]},
        {(1, 0): k}, depth_images={(1, 0): depth_test}, renderer=renderer,
        cameras={(1, 0): cam},
    )

    # --- Restatement: dist images, masks, step costs, (tau, theta) grid ---
    def to_dist(depth):
        h, w = depth.shape
        dist = np.zeros_like(depth)
        ys, xs = np.mgrid[0:h, 0:w]
        x = (xs - k[0, 2]) * depth / k[0, 0]
        y = (ys - k[1, 2]) * depth / k[1, 1]
        dist = np.sqrt(x * x + y * y + depth * depth)
        return dist

    delta = 15.0
    d_test = to_dist(depth_test)
    d_gt = to_dist(render_depth(r_gt, t_gt))
    d_est = to_dist(render_depth(r_est, t_est))
    visib_gt = ((d_gt - d_test <= delta) | (d_test == 0)) & (d_gt > 0)
    visib_est = ((d_est - d_test <= delta) | (d_test == 0)) & (d_est > 0)
    visib_est = visib_est | (visib_gt & (d_est > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    recalls = []
    for ti in range(10):
        tau = 0.05 * (ti + 1) * dia
        costs = (np.abs(d_est - d_gt) > tau) & inter
        e = (costs.sum() + union.sum() - inter.sum()) / union.sum()
        for hi in range(10):
            th = 0.05 * (hi + 1)
            recalls.append(1.0 if e < th else 0.0)
    want_ar_vsd = float(np.mean(recalls))
    assert 0.0 < want_ar_vsd < 1.0  # the case spans the threshold grid
    np.testing.assert_allclose(got["ar_vsd"], want_ar_vsd, atol=1e-12)
