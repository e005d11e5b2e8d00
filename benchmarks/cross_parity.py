"""Pose-level cross-implementation parity: reference-style replica vs JAX.

The strongest offline parity evidence available without BOP data/weights
(VERDICT r2 #1): an INDEPENDENT per-instance re-implementation of the
reference's online pipeline in the reference's own library stack —
numpy/sklearn/cv2, one crop at a time (reference: scripts/infer.py:368-733,
utils/template_util.py:31-202, utils/corresp_util.py:34-170,
utils/pnp_util.py:40-79) — is run against the batched JAX pipeline on the
SAME structured synthetic world at LM-O scale (798 templates, 2048 visual
words, 256-d features, 400 feats/template), and the two must agree at the
pose/AR level.

Three legs:
  1. Offline tf-idf: the replica recomputes word idfs + template descriptors
     from the raw banks with sklearn/numpy (reference formulas re-derived,
     not imported) and they are compared against the JAX-built repre.
  2. Online pose: per-crop rotation/translation deltas + synthetic-AR delta
     between the replica (sklearn kNN retrieval -> cyclic buddies ->
     cv2.solvePnPRansac+LM) and the JAX pipeline (exact f32 and the benched
     bf16+approx-topk fast path).
  3. ViT features: identical random weights are shared into a transformers
     Dinov2WithRegisters model via models/weights.to_hf_state_dict, and the
     layer-9 token facet is compared on real 420x420 inputs (the image ->
     feature stage both pipelines sit on).

Usage: python benchmarks/cross_parity.py [--crops 100] [--templates 798]
Prints one JSON report line; exits nonzero when AR delta > 1 pt.
A scaled-down version runs in tests/test_cross_parity.py.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CROP = 420
CELL = 14.0
GRID = 30


# ---------------------------------------------------------------------------
# World generation (scaled generalization of tests/test_pipeline.
# make_synthetic_world: object = point cloud with unique descriptors,
# templates = point subsets, queries = projected descriptors + noise/clutter)
# ---------------------------------------------------------------------------

def make_world(rng, num_templates=798, pts_per_template=400, feat_dim=256,
               num_words=2048, n_points=4000):
    import jax.numpy as jnp

    from foundpose_tpu.ops import tfidf as tfidf_mod
    from foundpose_tpu.ops.tfidf import TfidfConfig
    from foundpose_tpu.repre import make_repre
    from foundpose_tpu.structs import PinholeCamera

    obj_points = rng.uniform(-0.08, 0.08, size=(n_points, 3)).astype(np.float32)
    obj_feats = rng.normal(size=(n_points, feat_dim)).astype(np.float32) * 3.0

    feat_vectors, vertices, tpl_ids, tpl_point_ids = [], [], [], []
    for t in range(num_templates):
        sel = rng.choice(n_points, size=pts_per_template, replace=False)
        tpl_point_ids.append(sel)
        feat_vectors.append(obj_feats[sel])
        vertices.append(obj_points[sel])
        tpl_ids.append(np.full(pts_per_template, t))
    feat_vectors = np.concatenate(feat_vectors)
    vertices = np.concatenate(vertices)
    tpl_ids = np.concatenate(tpl_ids).astype(np.int32)

    words = obj_feats[rng.choice(n_points, size=num_words, replace=False)]
    words = (words + 0.01 * rng.normal(size=words.shape)).astype(np.float32)

    cfg = TfidfConfig(knn_k=3)
    descs, idfs = tfidf_mod.calc_template_tfidf_descriptors(
        jnp.asarray(feat_vectors), jnp.asarray(tpl_ids), jnp.asarray(words),
        num_templates, cfg,
    )
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (num_templates, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (num_templates, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (num_templates, 1, 1)),
        width=CROP, height=CROP,
    )
    repre = make_repre(
        feat_vectors=feat_vectors,
        vertices=vertices,
        feat_to_template_ids=tpl_ids,
        word_centroids=np.asarray(words),
        word_idfs=np.asarray(idfs),
        template_descs=np.asarray(descs),
        template_cameras=cameras,
        tfidf_config=cfg,
    )
    return repre, obj_points, obj_feats, tpl_point_ids


def render_query(rng, obj_points, obj_feats, tpl_point_ids, target_tpl,
                 pose_seed, feat_noise=0.3, clutter_cells=40):
    """A crop viewing the object under a random GT pose with descriptor noise
    and clutter cells (mirrors tests/test_fastpath_ar.render_noisy_query)."""
    from scipy.spatial.transform import Rotation

    pr = np.random.default_rng(pose_seed)
    r_gt = Rotation.from_rotvec(pr.uniform(-0.3, 0.3, 3)).as_matrix().astype(
        np.float32
    )
    t_gt = np.array(
        [pr.uniform(-0.02, 0.02), pr.uniform(-0.02, 0.02),
         pr.uniform(0.45, 0.6)],
        dtype=np.float32,
    )
    k_f = np.array([600.0, 600.0], dtype=np.float32)
    k_c = np.array([209.5, 209.5], dtype=np.float32)

    pts = obj_points[tpl_point_ids[target_tpl]]
    feats = obj_feats[tpl_point_ids[target_tpl]]
    cam = pts @ r_gt.T + t_gt
    proj = cam[:, :2] / cam[:, 2:3] * k_f + k_c

    d = obj_feats.shape[1]
    fmap = rng.normal(size=(GRID, GRID, d)).astype(np.float32) * 0.05
    mask = np.zeros((CROP, CROP), dtype=np.float32)
    c = int(CELL)
    for p, f in zip(proj, feats):
        cx, cy = int(p[0] // CELL), int(p[1] // CELL)
        if 0 <= cx < GRID and 0 <= cy < GRID:
            fmap[cy, cx] = f + feat_noise * rng.normal(size=d).astype(np.float32)
            mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    for _ in range(clutter_cells):
        cx, cy = rng.integers(0, GRID), rng.integers(0, GRID)
        fmap[cy, cx] = rng.normal(size=d).astype(np.float32) * 3.0
        mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    return fmap, mask, r_gt, t_gt


# ---------------------------------------------------------------------------
# Reference-style replica (numpy/sklearn/cv2, one instance at a time)
# ---------------------------------------------------------------------------

class ReferenceReplica:
    """Independent per-instance implementation of the reference online chain.

    Re-derives the reference math from its source (cited per method) using
    the reference's own CPU library stack; nothing here calls into
    foundpose_tpu ops, so agreement with the JAX pipeline cross-validates
    both implementations.
    """

    def __init__(self, bank_feats_by_tpl, bank_verts_by_tpl, words,
                 tfidf_knn_k=3, soft_assign=False, soft_sigma_squared=10.0,
                 top_n_templates=5, top_k_buddies=300, pnp_ransac_iter=400,
                 pnp_inlier_thresh=10.0, pnp_refine_lm=True):
        from sklearn.neighbors import NearestNeighbors

        self.tpl_feats = bank_feats_by_tpl
        self.tpl_verts = bank_verts_by_tpl
        self.words = words
        self.knn_k = tfidf_knn_k
        self.soft_assign = soft_assign
        self.soft_sigma_squared = soft_sigma_squared
        self.top_n = top_n_templates
        self.top_k = top_k_buddies
        self.ransac_iter = pnp_ransac_iter
        self.inlier_thresh = pnp_inlier_thresh
        self.refine_lm = pnp_refine_lm

        self.num_templates = len(bank_feats_by_tpl)
        # Per-template feature kNN indices (reference: infer.py:226-239)
        # + the visual-word index (knn_util.py:49-51).
        self.words_nn = NearestNeighbors(
            n_neighbors=tfidf_knn_k, algorithm="brute"
        ).fit(words)
        self.tpl_nn = [
            NearestNeighbors(n_neighbors=1, algorithm="brute").fit(f)
            for f in bank_feats_by_tpl
        ]
        self.word_idfs, self.template_descs = self._offline_tfidf()

    # -- offline (reference: template_util.py:74-124) ----------------------

    def _offline_tfidf(self):
        """idf = log(T / occurrences); desc_t = tfidf of template t's feats.

        Occurrences count the NEAREST word only (the reference's
        feat_to_cluster_ids is k-means membership, scripts/gen_repre.py:
        293-332); descriptors use all knn_k assignments
        (template_util.py:107-121)."""
        occurrences = np.zeros(len(self.words), dtype=np.int64)
        per_tpl_assign = []
        for f in self.tpl_feats:
            dists, ids = self.words_nn.kneighbors(f)
            per_tpl_assign.append((dists, ids))
            occurrences[np.unique(ids[:, 0])] += 1
        with np.errstate(divide="ignore"):
            idfs = np.log(float(self.num_templates) / occurrences)
        descs = np.stack(
            [self._calc_tfidf(ids, dists, idfs)
             for dists, ids in per_tpl_assign]
        )
        return idfs, descs

    def _calc_tfidf(self, word_ids, word_dists, idfs):
        """reference template_util.py:31-71 (Torii et al.): per-feature
        weights L2-normalized over the k assignments, tf divided by the
        feature count, scatter-added into a [W] descriptor."""
        n, k = word_ids.shape
        if self.soft_assign:
            w = np.exp(-np.square(word_dists) / (2.0 * self.soft_sigma_squared))
        else:
            w = np.ones_like(word_dists)
        w = w / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        tf = (w / n).reshape(-1)
        ids = word_ids.reshape(-1)
        tfidf = tf * np.where(np.isfinite(idfs[ids]), idfs[ids], 0.0)
        desc = np.zeros(len(self.words), np.float64)
        np.add.at(desc, ids, tfidf)
        return desc.astype(np.float32)

    # -- online, one crop (reference: infer.py:368-733) --------------------

    def infer_one(self, fmap, mask, K):
        from sklearn.neighbors import NearestNeighbors

        # Query features at masked grid-cell centers (reference:
        # feature_util.py:100-131 grid_sample; exact here because the world's
        # descriptors are cell-aligned).
        c = int(CELL)
        cell_mask = mask[c // 2 :: c, c // 2 :: c] > 0.5  # [GRID, GRID]
        cys, cxs = np.nonzero(cell_mask)
        if len(cys) < 6:
            return {"success": False}
        q_feats = fmap[cys, cxs].astype(np.float32)
        q_points = np.stack(
            [(cxs + 0.5) * CELL, (cys + 0.5) * CELL], axis=1
        ).astype(np.float32)

        # tf-idf retrieval (reference: template_util.py:126-176).
        w_dists, w_ids = self.words_nn.kneighbors(q_feats)
        q_desc = self._calc_tfidf(w_ids, w_dists, self.word_idfs)
        descs = self.template_descs
        sims = (descs @ q_desc) / np.maximum(
            np.linalg.norm(descs, axis=1) * np.linalg.norm(q_desc), 1e-12
        )
        top_ids = np.argsort(-sims)[: self.top_n]

        # Cyclic buddies per retrieved template (corresp_util.py:34-132).
        q_nn = NearestNeighbors(n_neighbors=1, algorithm="brute").fit(q_feats)
        best = None
        for tid in top_ids:
            q2o = self.tpl_nn[tid].kneighbors(q_feats)[1][:, 0]
            o2q = q_nn.kneighbors(self.tpl_feats[tid])[1][:, 0]
            cycle_ids = o2q[q2o]
            cycle_dists = np.linalg.norm(
                q_points - q_points[cycle_ids], axis=1
            )
            top_k = min(self.top_k, len(q_points))
            bb_q = np.argsort(cycle_dists, kind="stable")[:top_k]
            bb_o = q2o[bb_q]
            obj_pts = self.tpl_verts[tid][bb_o].astype(np.float64)
            img_pts = q_points[bb_q].astype(np.float64)

            # PnP-RANSAC + optional LM on inliers (pnp_util.py:40-79),
            # best template by inlier count (infer.py:567-602).
            import cv2

            try:
                ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                    objectPoints=obj_pts.reshape(-1, 1, 3),
                    imagePoints=img_pts.reshape(-1, 1, 2),
                    cameraMatrix=K.astype(np.float64),
                    distCoeffs=None,
                    iterationsCount=self.ransac_iter,
                    reprojectionError=self.inlier_thresh,
                    confidence=0.99,
                    flags=cv2.SOLVEPNP_ITERATIVE,
                )
            except cv2.error:
                continue
            if not ok or inliers is None or len(inliers) < 6:
                continue
            if self.refine_lm:
                rvec, tvec = cv2.solvePnPRefineLM(
                    objectPoints=obj_pts[inliers[:, 0]].reshape(-1, 1, 3),
                    imagePoints=img_pts[inliers[:, 0]].reshape(-1, 1, 2),
                    cameraMatrix=K.astype(np.float64),
                    distCoeffs=None,
                    rvec=rvec, tvec=tvec,
                )
            n_inl = len(inliers)
            if best is None or n_inl > best["quality"]:
                best = {
                    "success": True,
                    "R": cv2.Rodrigues(rvec)[0],
                    "t": tvec.reshape(3),
                    "quality": n_inl,
                    "template": int(tid),
                }
        return best or {"success": False}


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def rot_err_deg(r1, r2):
    cosv = (np.trace(r1 @ r2.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cosv, -1.0, 1.0))))


def ar_recall(rs, ts, succ, rs_gt, ts_gt, rot_thresh=5.0, t_thresh=0.015):
    ok = []
    for i in range(len(rs_gt)):
        ok.append(
            bool(succ[i])
            and rot_err_deg(np.asarray(rs[i]), rs_gt[i]) < rot_thresh
            and float(np.linalg.norm(np.asarray(ts[i]) - ts_gt[i])) < t_thresh
        )
    return float(np.mean(ok)), ok


def bop_ar_score(rs, ts, succ, rs_gt, ts_gt, model_points, K, image_width):
    """Scores poses through the REAL BOP19 protocol layer (eval/bop_ar.py):
    each crop is one single-instance image; AR = mean(AR_MSSD, AR_MSPD).

    `ar_recall` above is a fixed-threshold parity gate between the two
    implementations; this runs the actual scorekeeper end-to-end on both
    sides' poses (VERDICT r4 directive: the protocol layer must be
    exercised on real pipeline outputs, not only unit tests).
    """
    from foundpose_tpu.eval import bop_ar

    # Subsample model points: MSSD/MSPD maxima stabilize well below the
    # full 4000-point cloud and both sides see the identical subset.
    pts = np.asarray(model_points[:: max(1, len(model_points) // 400)])
    dia = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    gts, ests, intr = [], [], {}
    for i in range(len(rs_gt)):
        gts.append(bop_ar.GroundTruth(1, i, 7, np.asarray(rs_gt[i]),
                                      np.asarray(ts_gt[i])))
        intr[(1, i)] = np.asarray(K, np.float64)
        if bool(succ[i]):
            ests.append(bop_ar.Estimate(1, i, 7, 1.0, np.asarray(rs[i]),
                                        np.asarray(ts[i])))
    out = bop_ar.evaluate_ar(
        ests, gts, {7: pts}, {7: dia}, {7: [(np.eye(3), np.zeros(3))]},
        intr, image_width=image_width,
    )
    return out["bop_ar"]


def run_parity(num_templates=798, pts_per_template=400, feat_dim=256,
               num_words=2048, n_points=4000, n_crops=100, seed=0,
               top_n_templates=5, top_k_buddies=300, pnp_ransac_iter=400,
               verbose=True):
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.pipeline import inference

    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    repre, obj_points, obj_feats, tpl_point_ids = make_world(
        rng, num_templates, pts_per_template, feat_dim, num_words, n_points
    )
    if verbose:
        print(f"[parity] world built in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    # Replica gets the RAW world data (per-template banks + centroids), not
    # the JAX-derived tf-idf artifacts — it recomputes those itself.
    bank_feats = [
        np.asarray(obj_feats[tpl_point_ids[t]], np.float32)
        for t in range(num_templates)
    ]
    bank_verts = [
        np.asarray(obj_points[tpl_point_ids[t]], np.float32)
        for t in range(num_templates)
    ]
    t0 = time.perf_counter()
    replica = ReferenceReplica(
        bank_feats, bank_verts, np.asarray(repre.word_centroids),
        top_n_templates=top_n_templates, top_k_buddies=top_k_buddies,
        pnp_ransac_iter=pnp_ransac_iter,
    )
    offline_s = time.perf_counter() - t0

    # Leg 1: offline tf-idf artifacts agree.
    idf_jax = np.asarray(repre.word_idfs)
    finite = np.isfinite(replica.word_idfs) & np.isfinite(idf_jax)
    idf_delta = float(np.abs(replica.word_idfs[finite] - idf_jax[finite]).max())
    descs_jax = np.asarray(repre.template_descs)
    desc_cos = np.sum(replica.template_descs * descs_jax, axis=1) / np.maximum(
        np.linalg.norm(replica.template_descs, axis=1)
        * np.linalg.norm(descs_jax, axis=1),
        1e-12,
    )
    desc_cos_min = float(desc_cos.min())
    if verbose:
        print(
            f"[parity] offline replica {offline_s:.1f}s; idf max|delta|="
            f"{idf_delta:.2e}; template-desc cosine min={desc_cos_min:.6f}",
            file=sys.stderr,
        )

    # Queries.
    fmaps, masks, rs_gt, ts_gt = [], [], [], []
    for i in range(n_crops):
        fmap, mask, r_gt, t_gt = render_query(
            rng, obj_points, obj_feats, tpl_point_ids,
            target_tpl=i % num_templates, pose_seed=1000 + i,
        )
        fmaps.append(fmap)
        masks.append(mask)
        rs_gt.append(r_gt)
        ts_gt.append(t_gt)

    # Replica online pass.
    K = np.array([[600.0, 0, 209.5], [0, 600.0, 209.5], [0, 0, 1]], np.float32)
    t0 = time.perf_counter()
    rep_out = [replica.infer_one(fmaps[i], masks[i], K) for i in range(n_crops)]
    rep_s = time.perf_counter() - t0
    rep_rs = [o.get("R", np.eye(3)) for o in rep_out]
    rep_ts = [o.get("t", np.zeros(3)) for o in rep_out]
    rep_succ = [o["success"] for o in rep_out]

    # JAX pipeline, exact f32 and the benched fast path.
    from foundpose_tpu.structs import PinholeCamera

    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (n_crops, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (n_crops, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (n_crops, 1, 1)),
        width=CROP, height=CROP,
    )
    fmaps_j = jnp.asarray(np.stack(fmaps))
    masks_j = jnp.asarray(np.stack(masks))
    base = dict(top_n_templates=top_n_templates, top_k_buddies=top_k_buddies,
                pnp_ransac_iter=pnp_ransac_iter)
    out_exact = inference.pose_from_features(
        fmaps_j, masks_j, cameras, repre, jax.random.PRNGKey(0),
        inference.InferenceConfig(**base),
    )
    out_fast = inference.pose_from_features(
        fmaps_j, masks_j, cameras, repre, jax.random.PRNGKey(0),
        inference.InferenceConfig(
            **base, compute_dtype=jnp.bfloat16, approx_topk=True
        ),
    )

    report = {"metric": "cross_implementation_parity", "n_crops": n_crops,
              "num_templates": num_templates, "num_words": num_words,
              "idf_max_delta": idf_delta,
              "template_desc_cosine_min": desc_cos_min,
              "replica_sec_per_crop": round(rep_s / n_crops, 3)}
    ar_rep, ok_rep = ar_recall(rep_rs, rep_ts, rep_succ, rs_gt, ts_gt)
    report["ar_replica"] = ar_rep
    report["bop_ar_replica"] = round(
        bop_ar_score(rep_rs, rep_ts, rep_succ, rs_gt, ts_gt, obj_points, K,
                     image_width=CROP), 4)
    for name, out in (("exact", out_exact), ("fast", out_fast)):
        rs = np.asarray(out.R_m2c)
        ts = np.asarray(out.t_m2c)
        succ = np.asarray(out.success)
        ar, ok = ar_recall(rs, ts, succ, rs_gt, ts_gt)
        # Pose deltas on crops where BOTH implementations succeeded (two
        # correct poses can sit on opposite sides of GT, so deltas up to 2x
        # the success thresholds are expected).
        drots, dts, tpl_agree = [], [], []
        for i in range(n_crops):
            if ok[i] and ok_rep[i]:
                drots.append(rot_err_deg(rs[i], rep_rs[i]))
                dts.append(float(np.linalg.norm(ts[i] - rep_ts[i])))
                tpl_agree.append(
                    int(np.asarray(out.best_template)[i]) == rep_out[i]["template"]
                )
        report[f"ar_jax_{name}"] = ar
        report[f"ar_delta_{name}"] = round(abs(ar - ar_rep), 4)
        report[f"bop_ar_jax_{name}"] = round(
            bop_ar_score(rs, ts, succ, rs_gt, ts_gt, obj_points, K,
                         image_width=CROP), 4)
        report[f"bop_ar_delta_{name}"] = round(
            abs(report[f"bop_ar_jax_{name}"] - report["bop_ar_replica"]), 4)
        report[f"median_rot_delta_deg_{name}"] = (
            round(float(np.median(drots)), 3) if drots else None
        )
        report[f"median_t_delta_mm_{name}"] = (
            round(float(np.median(dts)) * 1000, 2) if dts else None
        )
        report[f"template_agreement_{name}"] = (
            round(float(np.mean(tpl_agree)), 3) if tpl_agree else None
        )
        report[f"both_succeeded_{name}"] = len(drots)
    return report


def render_query_smooth(rng, obj_points, obj_feats, tpl_point_ids, target_tpl,
                        pose_seed, feat_noise=0.1):
    """A crop whose feature field carries SUB-CELL position signal: each
    object point's descriptor is bilinearly SPLATTED into the 4 feature
    cells around its true projection (in the sampling convention of
    ops/sampling.sample_feature_map: pixel p -> fm coord p/cell - 0.5).

    This is the field class featuremetric refinement exists for — a
    feature map that varies smoothly with sub-cell alignment, like real
    DINOv2 maps — unlike render_query's one-cell writes, which carry no
    information below the 14-px grid (so the coarse cell-center PnP is
    already at the optimum there)."""
    from scipy.spatial.transform import Rotation

    pr = np.random.default_rng(pose_seed)
    r_gt = Rotation.from_rotvec(pr.uniform(-0.3, 0.3, 3)).as_matrix().astype(
        np.float32
    )
    t_gt = np.array(
        [pr.uniform(-0.02, 0.02), pr.uniform(-0.02, 0.02),
         pr.uniform(0.45, 0.6)],
        dtype=np.float32,
    )
    k_f = np.array([600.0, 600.0], dtype=np.float32)
    k_c = np.array([209.5, 209.5], dtype=np.float32)

    pts = obj_points[tpl_point_ids[target_tpl]]
    feats = obj_feats[tpl_point_ids[target_tpl]]
    cam = pts @ r_gt.T + t_gt
    proj = cam[:, :2] / cam[:, 2:3] * k_f + k_c

    d = obj_feats.shape[1]
    acc = np.zeros((GRID, GRID, d), dtype=np.float64)
    wsum = np.zeros((GRID, GRID), dtype=np.float64)
    for p, f in zip(proj, feats):
        fn = f + feat_noise * rng.normal(size=d)
        u, v = p[0] / CELL - 0.5, p[1] / CELL - 0.5
        x0, y0 = int(np.floor(u)), int(np.floor(v))
        fx, fy = u - x0, v - y0
        for xi, yi, w in ((x0, y0, (1 - fx) * (1 - fy)),
                          (x0 + 1, y0, fx * (1 - fy)),
                          (x0, y0 + 1, (1 - fx) * fy),
                          (x0 + 1, y0 + 1, fx * fy)):
            if 0 <= xi < GRID and 0 <= yi < GRID:
                acc[yi, xi] += w * fn
                wsum[yi, xi] += w
    fmap = rng.normal(size=(GRID, GRID, d)).astype(np.float32) * 0.05
    mask = np.zeros((CROP, CROP), dtype=np.float32)
    covered = wsum > 0.05
    fmap[covered] = (acc[covered] / wsum[covered, None]).astype(np.float32)
    c = int(CELL)
    for cy, cx in zip(*np.nonzero(covered)):
        mask[cy * c : (cy + 1) * c, cx * c : (cx + 1) * c] = 1.0
    return fmap, mask, r_gt, t_gt


def featuremetric_leg(n_crops=100, num_templates=96, pts_per_template=200,
                      feat_dim=64, num_words=512, n_points=2000, seed=0,
                      refine_iters=8, verbose=True):
    """Accuracy characterization of featuremetric refinement (the paper
    stage absent from the reference OSS, reference README.md:34): the exact
    pipeline with refine_featuremetric off vs on, on the splatted-feature
    world, reporting recall + median rot/trans error vs GT + BOP AR.
    """
    import jax
    import jax.numpy as jnp

    from foundpose_tpu.pipeline import inference
    from foundpose_tpu.structs import PinholeCamera

    rng = np.random.default_rng(seed)
    repre, obj_points, obj_feats, tpl_point_ids = make_world(
        rng, num_templates, pts_per_template, feat_dim, num_words, n_points
    )
    fmaps, masks, rs_gt, ts_gt = [], [], [], []
    for i in range(n_crops):
        fmap, mask, r_gt, t_gt = render_query_smooth(
            rng, obj_points, obj_feats, tpl_point_ids,
            target_tpl=i % num_templates, pose_seed=2000 + i,
        )
        fmaps.append(fmap)
        masks.append(mask)
        rs_gt.append(r_gt)
        ts_gt.append(t_gt)
    K = np.array([[600.0, 0, 209.5], [0, 600.0, 209.5], [0, 0, 1]], np.float32)
    cameras = PinholeCamera(
        f=jnp.tile(jnp.asarray([[600.0, 600.0]]), (n_crops, 1)),
        c=jnp.tile(jnp.asarray([[209.5, 209.5]]), (n_crops, 1)),
        T_world_from_eye=jnp.tile(jnp.eye(4)[None], (n_crops, 1, 1)),
        width=CROP, height=CROP,
    )
    fmaps_j = jnp.asarray(np.stack(fmaps))
    masks_j = jnp.asarray(np.stack(masks))

    base = dict(top_n_templates=5, top_k_buddies=300, pnp_ransac_iter=200)
    report = {"metric": "featuremetric_refinement", "n_crops": n_crops,
              "num_templates": num_templates, "refine_iters": refine_iters}
    for name, extra in (
        ("off", {}),
        ("on", {"refine_featuremetric": True,
                "featuremetric_iters": refine_iters}),
    ):
        out = inference.pose_from_features(
            fmaps_j, masks_j, cameras, repre, jax.random.PRNGKey(0),
            inference.InferenceConfig(**base, **extra),
        )
        rs = np.asarray(out.R_m2c)
        ts = np.asarray(out.t_m2c)
        succ = np.asarray(out.success)
        ar, ok = ar_recall(rs, ts, succ, rs_gt, ts_gt)
        rot_errs = [rot_err_deg(rs[i], rs_gt[i]) for i in range(n_crops)
                    if succ[i]]
        t_errs = [float(np.linalg.norm(ts[i] - ts_gt[i])) * 1000.0
                  for i in range(n_crops) if succ[i]]
        report[f"recall_{name}"] = ar
        report[f"bop_ar_{name}"] = round(
            bop_ar_score(rs, ts, succ, rs_gt, ts_gt, obj_points, K,
                         image_width=CROP), 4)
        report[f"median_rot_err_deg_{name}"] = round(
            float(np.median(rot_errs)), 3)
        report[f"median_t_err_mm_{name}"] = round(float(np.median(t_errs)), 3)
        report[f"n_success_{name}"] = int(np.sum(succ))
        if verbose:
            print(f"[featuremetric] {name}: recall={ar:.3f} "
                  f"bop_ar={report[f'bop_ar_{name}']:.4f} "
                  f"median rot={report[f'median_rot_err_deg_{name}']} deg "
                  f"t={report[f'median_t_err_mm_{name}']} mm", file=sys.stderr)
    report["rot_err_improvement_deg"] = round(
        report["median_rot_err_deg_off"] - report["median_rot_err_deg_on"], 3)
    report["t_err_improvement_mm"] = round(
        report["median_t_err_mm_off"] - report["median_t_err_mm_on"], 3)
    return report


def vit_parity_leg(n_crops=2, size=None):
    """Shared-weights ViT check: JAX extract_facet vs transformers
    Dinov2WithRegisters on the SAME random ViT-S weights (exported with
    models/weights.to_hf_state_dict), layer-9 token facet, final-norm
    applied on both sides.

    Default size is the NATIVE pretraining resolution (pos_grid x patch =
    518px for ViT-S/14), where no positional-embedding interpolation runs on
    either side — the clean cross-check of the transformer math. At
    interpolated resolutions (e.g. the 420px crop size) transformers'
    Dinov2WithRegisters uses a different bicubic recipe than the official
    DINOv2 repo (whose +0.1-scale quirk we replicate, models/dinov2.py), so
    a ~0.1 max feature delta there reflects the two TORCH implementations
    disagreeing with each other, not a JAX-side error."""
    import jax
    import jax.numpy as jnp
    import torch

    from foundpose_tpu.models import dinov2, weights

    cfg = dinov2.parse_model_name(
        "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"
    )
    if size is None:
        size = cfg.pos_grid * cfg.patch_size  # native: no pos-embed interp
    params = dinov2.init_params(jax.random.PRNGKey(0), cfg)

    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, mlp_ratio=int(cfg.mlp_ratio),
        patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_register_tokens,
        image_size=cfg.pos_grid * cfg.patch_size,
        use_swiglu_ffn=cfg.swiglu, hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps, attn_implementation="eager",
    )
    model = Dinov2WithRegistersModel(hf_cfg)
    missing, unexpected = model.load_state_dict(
        weights.to_hf_state_dict(params, cfg), strict=False
    )
    assert all("mask_token" in m for m in missing), missing
    model.eval()

    rng = np.random.default_rng(3)
    images = rng.uniform(size=(n_crops, size, size, 3)).astype(np.float32)
    ours = np.asarray(
        dinov2.extract_facet(params, cfg, jnp.asarray(images))["feature_maps"]
    )
    with torch.no_grad():
        out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
        hs = out.hidden_states[cfg.layer + 1]
        hs = model.layernorm(hs)  # apply_norm=1: final LN on the facet
    g = size // cfg.patch_size
    theirs = (
        hs[:, 1 + cfg.num_register_tokens :]
        .reshape(n_crops, g, g, cfg.embed_dim)
        .numpy()
    )
    return float(np.abs(ours - theirs).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crops", type=int, default=100)
    ap.add_argument("--templates", type=int, default=798)
    ap.add_argument("--skip-vit", action="store_true")
    ap.add_argument("--featuremetric", action="store_true",
                    help="run ONLY the featuremetric refine-on/off leg")
    args = ap.parse_args()

    # Parity is a determinism check, not a perf bench: pin the CPU backend
    # (env JAX_PLATFORMS alone is overridden where a sitecustomize pins a
    # hardware plugin; same approach as __graft_entry__.dryrun_multichip),
    # and keep the chip free for concurrent perf runs.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.featuremetric:
        report = featuremetric_leg(n_crops=args.crops)
        print(json.dumps(report))
        return 0

    report = run_parity(num_templates=args.templates, n_crops=args.crops)
    if not args.skip_vit:
        t0 = time.perf_counter()
        report["vit_feature_max_delta_native"] = round(vit_parity_leg(), 6)
        # Interpolated resolution: documents the HF-vs-official-DINOv2
        # bicubic divergence (see vit_parity_leg docstring) — NOT a gate.
        report["vit_feature_max_delta_420_interp"] = round(
            vit_parity_leg(size=CROP), 6
        )
        print(f"[parity] vit legs {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    print(json.dumps(report))
    if report["ar_delta_fast"] > 0.01 + 1e-9 or report["ar_delta_exact"] > 0.01 + 1e-9:
        print("[parity] FAIL: AR delta exceeds 1 pt", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
