import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import geometry
from foundpose_tpu.pose import corresp, pnp


# ---------------------------------------------------------------------------
# Cyclic buddies
# ---------------------------------------------------------------------------


def test_cyclic_buddies_identity_match(rng):
    """When query and object features are identical, every point is a buddy
    with cycle distance zero."""
    q = rng.normal(size=(40, 8)).astype(np.float32)
    pts = rng.uniform(0, 100, size=(40, 2)).astype(np.float32)
    q_ids, o_ids, dists, scores, valid = corresp.cyclic_buddies(
        jnp.asarray(pts),
        jnp.asarray(q),
        jnp.ones(40, bool),
        jnp.asarray(q),
        jnp.ones(40, bool),
        top_k=10,
    )
    np.testing.assert_array_equal(np.asarray(q_ids), np.asarray(o_ids))
    np.testing.assert_allclose(np.asarray(dists), 0.0)
    assert np.asarray(valid).all()


def test_cyclic_buddies_matches_reference_algorithm(rng):
    """Masked TPU implementation == literal numpy restatement of the reference
    (corresp_util.py:34-70) on an unmasked problem."""
    nq, nf, d = 60, 80, 16
    qf = rng.normal(size=(nq, d)).astype(np.float32)
    of = rng.normal(size=(nf, d)).astype(np.float32)
    pts = rng.uniform(0, 400, size=(nq, 2)).astype(np.float32)
    top_k = 45  # > number of mutual-NN pairs, so d_max > 0

    # Reference restatement.
    d_qo = ((qf[:, None] - of[None]) ** 2).sum(-1)
    q2o = d_qo.argmin(1)
    o2q = d_qo.argmin(0)
    cycle_ids = o2q[q2o]
    cyc = np.linalg.norm(pts - pts[cycle_ids], axis=1)
    order = np.argsort(cyc, kind="stable")[:top_k]
    exp_dists = cyc[order]
    exp_scores = 1.0 - exp_dists / exp_dists.max()
    exp_obj = q2o[order]

    q_ids, o_ids, dists, scores, valid = corresp.cyclic_buddies(
        jnp.asarray(pts),
        jnp.asarray(qf),
        jnp.ones(nq, bool),
        jnp.asarray(of),
        jnp.ones(nf, bool),
        top_k=top_k,
    )
    np.testing.assert_allclose(np.sort(np.asarray(dists)), np.sort(exp_dists), atol=1e-4)
    # Same set of matched query points (ordering among ties may differ).
    assert set(np.asarray(q_ids).tolist()) == set(order.tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(scores)), np.sort(exp_scores), atol=1e-4
    )


def test_cyclic_buddies_respects_masks(rng):
    nq, nf, d = 30, 30, 8
    qf = rng.normal(size=(nq, d)).astype(np.float32)
    of = rng.normal(size=(nf, d)).astype(np.float32)
    pts = rng.uniform(0, 100, size=(nq, 2)).astype(np.float32)
    qm = np.zeros(nq, bool)
    qm[:10] = True
    om = np.zeros(nf, bool)
    om[:15] = True
    q_ids, o_ids, _, _, valid = corresp.cyclic_buddies(
        jnp.asarray(pts), jnp.asarray(qf), jnp.asarray(qm),
        jnp.asarray(of), jnp.asarray(om), top_k=20,
    )
    v = np.asarray(valid)
    assert v.sum() == 10  # only 10 valid queries
    assert np.asarray(q_ids)[v].max() < 10
    assert np.asarray(o_ids)[v].max() < 15


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------


def synth_pnp_problem(rng, n=100, noise=0.0, outlier_frac=0.0):
    r = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = np.array([0.05, -0.03, 0.6])
    k_f = np.array([600.0, 600.0])
    k_c = np.array([210.0, 210.0])
    pts3d = rng.uniform(-0.1, 0.1, size=(n, 3))
    cam = pts3d @ r.T + t
    proj = cam[:, :2] / cam[:, 2:3] * k_f + k_c
    proj += noise * rng.normal(size=proj.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        proj[:n_out] = rng.uniform(0, 420, size=(n_out, 2))
    return r, t, pts3d, proj, k_f, k_c


def test_dlt_exact_recovery(rng):
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=6)
    rays = (proj - k_c) / k_f
    r_est, t_est = pnp._dlt_pose(jnp.asarray(pts3d, dtype=jnp.float32),
                                 jnp.asarray(rays, dtype=jnp.float32))
    assert float(geometry.rotation_error_deg(r_est, jnp.asarray(r))) < 0.5
    np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-3)


def test_ransac_pnp_clean(rng):
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=150, noise=0.3)
    res = pnp.ransac_pnp(
        jnp.asarray(proj, dtype=jnp.float32),
        jnp.asarray(pts3d, dtype=jnp.float32),
        jnp.ones(150, bool),
        jnp.asarray(k_f, dtype=jnp.float32),
        jnp.asarray(k_c, dtype=jnp.float32),
        jax.random.PRNGKey(0),
        num_hypotheses=200,
    )
    assert bool(res.success)
    assert float(geometry.rotation_error_deg(res.R, jnp.asarray(r))) < 1.0
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-3)
    assert float(res.quality) > 140


def test_ransac_pnp_with_outliers_matches_cv2(rng):
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(
        rng, n=200, noise=0.5, outlier_frac=0.4
    )
    res = pnp.ransac_pnp(
        jnp.asarray(proj, dtype=jnp.float32),
        jnp.asarray(pts3d, dtype=jnp.float32),
        jnp.ones(200, bool),
        jnp.asarray(k_f, dtype=jnp.float32),
        jnp.asarray(k_c, dtype=jnp.float32),
        jax.random.PRNGKey(1),
        num_hypotheses=400,
        inlier_thresh=10.0,
    )
    K = np.array([[k_f[0], 0, k_c[0]], [0, k_f[1], k_c[1]], [0, 0, 1.0]])
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pts3d.astype(np.float32),
        proj.astype(np.float32),
        K,
        None,
        iterationsCount=400,
        reprojectionError=10.0,
        confidence=0.99,
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok and bool(res.success)
    r_cv = cv2.Rodrigues(rvec)[0]
    # Both must recover the ground truth.
    assert float(geometry.rotation_error_deg(res.R, jnp.asarray(r))) < 1.5
    assert float(geometry.rotation_error_deg(jnp.asarray(r_cv), jnp.asarray(r))) < 1.5
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-2)
    # Inlier counts comparable (>= 90% of cv2's).
    assert float(res.quality) >= 0.9 * len(inl)


def test_ransac_pnp_masked_padding(rng):
    """Padding rows with garbage must not affect the result."""
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=80, noise=0.2)
    pad = 40
    pts3d_p = np.concatenate([pts3d, rng.normal(size=(pad, 3)) * 100])
    proj_p = np.concatenate([proj, rng.uniform(-1000, 1000, size=(pad, 2))])
    valid = np.concatenate([np.ones(80, bool), np.zeros(pad, bool)])
    res = pnp.ransac_pnp(
        jnp.asarray(proj_p, dtype=jnp.float32),
        jnp.asarray(pts3d_p, dtype=jnp.float32),
        jnp.asarray(valid),
        jnp.asarray(k_f, dtype=jnp.float32),
        jnp.asarray(k_c, dtype=jnp.float32),
        jax.random.PRNGKey(2),
        num_hypotheses=200,
    )
    assert bool(res.success)
    assert float(geometry.rotation_error_deg(res.R, jnp.asarray(r))) < 1.0
    assert not np.asarray(res.inliers)[80:].any()


def test_lm_refinement_improves_noisy_pose(rng):
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=100, noise=0.0)
    # Perturb the pose.
    r0 = r @ Rotation.from_rotvec([0.03, -0.02, 0.01]).as_matrix()
    t0 = t + np.array([0.01, -0.005, 0.02])
    r_ref, t_ref = pnp.refine_pose_lm(
        jnp.asarray(r0, dtype=jnp.float32),
        jnp.asarray(t0, dtype=jnp.float32),
        jnp.asarray(proj, dtype=jnp.float32),
        jnp.asarray(pts3d, dtype=jnp.float32),
        jnp.ones(100, bool),
        jnp.asarray(k_f, dtype=jnp.float32),
        jnp.asarray(k_c, dtype=jnp.float32),
        iters=15,
    )
    err0 = float(geometry.rotation_error_deg(jnp.asarray(r0), jnp.asarray(r)))
    err1 = float(geometry.rotation_error_deg(r_ref, jnp.asarray(r)))
    assert err1 < 0.05 < err0
    np.testing.assert_allclose(np.asarray(t_ref), t, atol=1e-3)


def test_ransac_pnp_vmaps_over_templates(rng):
    """The solver must vmap over a leading template axis (top-5 templates)."""
    problems = [synth_pnp_problem(rng, n=60, noise=0.2) for _ in range(3)]
    proj = jnp.asarray(np.stack([p[3] for p in problems]), dtype=jnp.float32)
    pts = jnp.asarray(np.stack([p[2] for p in problems]), dtype=jnp.float32)
    k_f = jnp.asarray(problems[0][4], dtype=jnp.float32)
    k_c = jnp.asarray(problems[0][5], dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    res = jax.vmap(
        lambda p2, p3, k: pnp.ransac_pnp(
            p2, p3, jnp.ones(60, bool), k_f, k_c, k, num_hypotheses=150
        )
    )(proj, pts, keys)
    for i, (r, t, *_rest) in enumerate(problems):
        assert bool(np.asarray(res.success)[i])
        assert float(geometry.rotation_error_deg(res.R[i], jnp.asarray(r))) < 1.5


def test_cyclic_buddies_approx_topk_matches_exact(rng):
    nq, nf, d = 80, 90, 8
    qf = rng.normal(size=(nq, d)).astype(np.float32)
    of = rng.normal(size=(nf, d)).astype(np.float32)
    pts = rng.uniform(0, 400, size=(nq, 2)).astype(np.float32)
    exact = corresp.cyclic_buddies(
        jnp.asarray(pts), jnp.asarray(qf), jnp.ones(nq, bool),
        jnp.asarray(of), jnp.ones(nf, bool), top_k=40, approx_topk=False,
    )
    approx = corresp.cyclic_buddies(
        jnp.asarray(pts), jnp.asarray(qf), jnp.ones(nq, bool),
        jnp.asarray(of), jnp.ones(nf, bool), top_k=40, approx_topk=True,
    )
    # On CPU approx_min_k is exact; the selected query sets must agree.
    assert set(np.asarray(exact[0]).tolist()) == set(np.asarray(approx[0]).tolist())


def test_unrolled_cholesky_matches_scipy(rng):
    from scipy.linalg import cho_factor, cho_solve

    a = rng.normal(size=(7, 12, 12))
    ata = a @ np.transpose(a, (0, 2, 1)) + 0.1 * np.eye(12)
    l = np.asarray(pnp._cholesky_unrolled(jnp.asarray(ata, dtype=jnp.float32)))
    for i in range(7):
        np.testing.assert_allclose(l[i] @ l[i].T, ata[i], rtol=1e-4, atol=1e-4)
    b = rng.normal(size=(7, 12))
    x = np.asarray(
        pnp._cho_solve_unrolled(jnp.asarray(l), jnp.asarray(b))
    )
    for i in range(7):
        exp = cho_solve(cho_factor(ata[i]), b[i])
        np.testing.assert_allclose(x[i], exp, rtol=2e-3, atol=2e-3)


def test_dlt_pose_many_matches_per_hypothesis(rng):
    """Lane-major batched DLT == per-hypothesis solver.

    Equality is asserted (a) functionally for every hypothesis — the two
    solutions must explain the sampled points with the same max reprojection
    residual (that is what RANSAC scores) — and (b) as raw [R|t] vectors on
    well-conditioned hypotheses. On ill-conditioned minimal sets (tiny gap
    between the two smallest eigenvalues of A^T A) both fixed-iteration
    inverse-iteration solvers return near-valid mixtures of the near-null
    vectors that can differ as vectors while being reprojection-equivalent;
    RANSAC scores such hypotheses near zero anyway.
    """
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=60, noise=0.2)
    rays = ((proj - k_c) / k_f).astype(np.float32)
    pts3d = pts3d.astype(np.float32)
    # Distinct indices per hypothesis: duplicate rows make the DLT null space
    # ill-defined outright.
    ids = np.stack(
        [rng.permutation(60)[:6] for _ in range(32)]
    ).astype(np.int32)
    rs_m, ts_m = pnp._dlt_pose_many(
        jnp.asarray(pts3d), jnp.asarray(rays), jnp.asarray(ids)
    )

    def max_residual(r_mat, t_vec, i):
        cam = pts3d[ids[i]] @ np.asarray(r_mat).T + np.asarray(t_vec)
        z = np.where(np.abs(cam[:, 2:3]) < 1e-9, 1e-9, cam[:, 2:3])
        return np.abs(cam[:, :2] / z - rays[ids[i]]).max()

    for i in range(32):
        r_one, t_one = pnp._dlt_pose(
            jnp.asarray(pts3d[ids[i]]), jnp.asarray(rays[ids[i]])
        )
        r_exact, t_exact = pnp._dlt_pose(
            jnp.asarray(pts3d[ids[i]]), jnp.asarray(rays[ids[i]]), solver="eigh"
        )
        res_m = max_residual(rs_m[i], ts_m[i], i)
        res_1 = max_residual(r_one, t_one, i)
        d_exact = max(
            np.abs(np.asarray(r_one) - np.asarray(r_exact)).max(),
            np.abs(np.asarray(t_one) - np.asarray(t_exact)).max(),
        )
        if d_exact < 5e-3:
            # Well-conditioned sample (the per-hypothesis solver agrees with
            # the exact eigendecomposition): the batched solver must agree
            # functionally (within ~3 px at f=600 — the batched solver's
            # global Hartley normalization weights the noisy algebraic
            # objective slightly differently than the per-hypothesis one, so
            # sub-noise-level residual differences are inherent; the RANSAC
            # inlier threshold is 10 px) and as raw [R|t] vectors.
            assert abs(res_m - res_1) < 5e-3, (i, res_m, res_1)
            np.testing.assert_allclose(
                np.asarray(rs_m[i]), np.asarray(r_one), atol=2e-2
            )
            np.testing.assert_allclose(
                np.asarray(ts_m[i]), np.asarray(t_one), atol=2e-2
            )
        else:
            # Ill-conditioned minimal set: the two solvers' normalizations
            # weight the (near-singular) algebraic objective differently and
            # can land on different near-null mixtures. The only equivalence
            # RANSAC cares about: either both solutions are junk (max sample
            # residual beyond the 10 px inlier threshold -> zero-inlier
            # hypothesis either way), or they agree coarsely.
            inlier_thresh = 10.0 / 600.0  # px -> normalized coords
            both_junk = min(res_m, res_1) > inlier_thresh
            assert both_junk or abs(res_m - res_1) < 2e-2, (i, res_m, res_1)


def test_fused_score_matches_xla_path(rng):
    """ransac_pnp with the Pallas inlier-count kernel (interpreter mode) ==
    the XLA scoring path: same winner, same quality, same pose."""
    from jax.experimental.pallas import tpu as pltpu

    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(
        rng, n=80, noise=0.5, outlier_frac=0.3
    )
    args = (
        jnp.asarray(proj, dtype=jnp.float32),
        jnp.asarray(pts3d, dtype=jnp.float32),
        jnp.ones(80, bool),
        jnp.asarray(k_f, dtype=jnp.float32),
        jnp.asarray(k_c, dtype=jnp.float32),
        jax.random.PRNGKey(5),
    )
    res_xla = pnp.ransac_pnp(*args, num_hypotheses=150, use_fused_score=False)
    with pltpu.force_tpu_interpret_mode():
        res_fused = pnp.ransac_pnp(
            *args, num_hypotheses=150, use_fused_score=True
        )
    assert float(res_xla.quality) == float(res_fused.quality)
    np.testing.assert_allclose(
        np.asarray(res_fused.R), np.asarray(res_xla.R), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_fused.t), np.asarray(res_xla.t), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(res_fused.inliers), np.asarray(res_xla.inliers)
    )


# ---------------------------------------------------------------------------
# LO-RANSAC local optimization
# ---------------------------------------------------------------------------


def test_lo_refine_identity_at_zero_iters(rng):
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=60, noise=0.3)
    rj = jnp.asarray(r, jnp.float32)
    tj = jnp.asarray(t, jnp.float32)
    r_out, t_out, inl, cnt = pnp.lo_refine(
        rj, tj,
        jnp.asarray(proj, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.ones(60, bool), jnp.asarray(k_f, jnp.float32),
        jnp.asarray(k_c, jnp.float32), iters=0,
    )
    np.testing.assert_array_equal(np.asarray(r_out), np.asarray(rj))
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(tj))
    assert int(cnt) == int(np.sum(np.asarray(inl)))


def test_lo_refine_monotone_and_improves_coarse_pose(rng):
    """From a perturbed pose on a noisy outlier-heavy set, LO must not lose
    base-threshold inliers and should pull the pose into the basin."""
    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(
        rng, n=200, noise=1.0, outlier_frac=0.3
    )
    dr = Rotation.from_rotvec([0.03, -0.02, 0.015]).as_matrix()
    r0 = jnp.asarray(dr @ r, jnp.float32)
    t0 = jnp.asarray(t + np.array([0.004, -0.003, 0.008]), jnp.float32)
    args = (
        jnp.asarray(proj, jnp.float32), jnp.asarray(pts3d, jnp.float32),
        jnp.ones(200, bool), jnp.asarray(k_f, jnp.float32),
        jnp.asarray(k_c, jnp.float32),
    )
    _, _, _, cnt0 = pnp.lo_refine(r0, t0, *args, iters=0)
    r_out, t_out, _, cnt = pnp.lo_refine(r0, t0, *args, iters=2)
    assert int(cnt) >= int(cnt0)
    assert float(geometry.rotation_error_deg(r_out, jnp.asarray(r))) < float(
        geometry.rotation_error_deg(r0, jnp.asarray(r))
    )
    assert float(geometry.rotation_error_deg(r_out, jnp.asarray(r))) < 1.0
    np.testing.assert_allclose(np.asarray(t_out), t, atol=5e-3)


def test_ransac_lo_beats_raw_dlt_on_outlier_heavy_sets(rng):
    """The measured cross-implementation gap (benchmarks/cross_parity.py):
    at equal iteration budgets cv2's polished minimal solver beats raw
    6-point DLT hypotheses on outlier-heavy noisy sets; LO-RANSAC must
    recover that quality. Aggregate over scenes to avoid flakiness."""
    wins = 0
    trials = 6
    for i in range(trials):
        r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(
            rng, n=300, noise=1.5, outlier_frac=0.5
        )
        common = dict(
            valid=jnp.ones(300, bool),
            k_f=jnp.asarray(k_f, jnp.float32),
            k_c=jnp.asarray(k_c, jnp.float32),
            key=jax.random.PRNGKey(100 + i),
            num_hypotheses=400,
            refine_lm=False,
        )
        res_raw = pnp.ransac_pnp(
            jnp.asarray(proj, jnp.float32), jnp.asarray(pts3d, jnp.float32),
            lo_iters=0, **common,
        )
        res_lo = pnp.ransac_pnp(
            jnp.asarray(proj, jnp.float32), jnp.asarray(pts3d, jnp.float32),
            lo_iters=2, **common,
        )
        assert float(res_lo.quality) >= float(res_raw.quality)
        if float(res_lo.quality) > float(res_raw.quality):
            wins += 1
    assert wins >= trials // 2


def test_refine_winner_rescues_subthreshold_winner(rng):
    """A winner with < 6 base-threshold inliers that LO pulls into the basin
    must be reported as a SUCCESS (post-refit count), matching cv2's
    post-polish success semantics (see inference.refine_winner docstring)."""
    from foundpose_tpu.pipeline.inference import InferenceConfig, refine_winner

    r, t, pts3d, proj, k_f, k_c = synth_pnp_problem(rng, n=40, noise=0.2)
    # Perturb the pose until most reprojections fall between the base (10 px)
    # and widened (20 px) thresholds: < 6 base inliers, rescuable by the
    # widened refit round.
    c2d = jnp.asarray(proj, jnp.float32)
    c3d = jnp.asarray(pts3d, jnp.float32)
    valid = jnp.ones(40, bool)
    kf = jnp.asarray(k_f, jnp.float32)
    kc = jnp.asarray(k_c, jnp.float32)
    # Small scales (0.02-0.05) rarely qualify — the perturbed pose usually
    # keeps >= 6 base-threshold inliers so there is nothing to rescue — but
    # they stay in the candidate list (the qualification check below skips
    # them) so a future threshold regression that makes them qualify again
    # is still covered instead of masked by retuned inputs.
    for scale in (0.02, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4):
        dr = Rotation.from_rotvec(np.array([1.1, -0.8, 0.6]) * scale).as_matrix()
        r0 = jnp.asarray(dr @ r, jnp.float32)
        t0 = jnp.asarray(t, jnp.float32)
        _, _, inl0, cnt0 = pnp.lo_refine(
            r0, t0, c2d, c3d, valid, kf, kc, iters=0
        )
        _, _, _, cnt_w = pnp.lo_refine(
            r0, t0, c2d, c3d, valid, kf, kc, inlier_thresh=20.0, iters=0
        )
        if float(cnt0) < 6 and float(cnt_w) >= 6:
            break
    else:
        raise AssertionError("could not construct a rescuable perturbation")

    config = InferenceConfig(pnp_lo_iters=2, pnp_refine_lm=False)
    r_out, t_out, cnt = refine_winner(
        r0, t0, inl0, cnt0, c2d, c3d, valid, kf, kc, config
    )
    assert float(cnt0) < 6  # pre-refit: would have been reported failed
    assert float(cnt) >= 6  # post-refit: success
    assert float(geometry.rotation_error_deg(r_out, jnp.asarray(r))) < float(
        geometry.rotation_error_deg(r0, jnp.asarray(r))
    )

    # With LO disabled the count passes through unchanged.
    config0 = InferenceConfig(pnp_lo_iters=0, pnp_refine_lm=False)
    _, _, cnt_same = refine_winner(
        r0, t0, inl0, cnt0, c2d, c3d, valid, kf, kc, config0
    )
    assert float(cnt_same) == float(cnt0)
