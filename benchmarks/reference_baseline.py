"""Measured stand-in for the reference pipeline's per-crop throughput.

The reference (facebookresearch/foundpose) publishes accuracy only — no
throughput numbers (SURVEY.md §6). Its online loop processes ONE instance at a
time through a chain of CPU libraries with device round-trips at every stage
(reference call stack: scripts/infer.py:368-733):

  warp (cv2.remap, CPU)                      misc.py:458-519
  ViT forward (torch, GPU if available)      dinov2_utils.py:115-158
  grid_sample (torch)                        feature_util.py:100-131
  PCA 384->256 (sklearn, CPU)                projector_util.py:66-69
  visual-word kNN k=3 (faiss, CPU-forced)    knn_util.py:49-51,74-79
  tf-idf + cosine top-5 (torch)              template_util.py:126-176
  x5 cyclic buddies (2 faiss searches each)  corresp_util.py:34-70
  PnP-RANSAC 400 iters + LM (cv2, CPU)       pnp_util.py:46-74

This script re-implements that loop faithfully in structure — batch size 1,
library round trips intact — with sklearn NearestNeighbors standing in for
faiss flat indices (both are BLAS brute-force; faiss is not installed here)
and transformers' Dinov2 for the torch ViT-S/14 forward. All data is
synthetic at the published LM-O scale (798 templates, 2048 words, PCA 256,
top-5 templates, 300 buddies, 400 RANSAC iters; configs/infer/lmo.json).

It prints a JSON line with per-stage seconds/crop, the measured end-to-end
crops/sec on THIS host, and a reference-favoring adjusted estimate described
in BASELINE.md (GPU ViT + multicore CPU assumptions for the reference's
unspecified hardware).
"""

import json
import sys
import time

import numpy as np

NUM_TEMPLATES = 798
NUM_WORDS = 2048
PCA_DIM = 256
RAW_DIM = 384
TOP_N_TEMPLATES = 5
NUM_BUDDIES = 300
RANSAC_ITERS = 400
GRID = 30  # 420/14 patches per side
CROP = 420

# Reference-favoring adjustments for hardware the reference assumes but this
# host lacks (1 CPU core, no GPU):
#   - ViT-S forward on a datacenter GPU: ~8 ms/crop (A100-class; generous).
#   - CPU stages (sklearn/cv2/faiss-equivalent): assume an 8-core workstation
#     with perfect BLAS scaling => measured single-core time / 8 (generous:
#     brute-force kNN and solvePnPRansac do not scale linearly in practice).
ADJ_VIT_S = 0.008
ADJ_CPU_SCALE = 1.0 / 8.0


def build_torch_vit():
    import torch
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=6,
        intermediate_size=1536,
        patch_size=14,
        image_size=518,
    )
    model = Dinov2Model(cfg)
    model.eval()
    return model


def main():
    import cv2
    import torch
    import torch.nn.functional as F
    from sklearn.decomposition import PCA
    from sklearn.neighbors import NearestNeighbors

    rng = np.random.default_rng(0)
    model = build_torch_vit()

    # --- per-object setup (reference does this once per object; not timed in
    # the per-crop number, same as the reference's own stage timers) ---
    word_centroids = rng.standard_normal((NUM_WORDS, PCA_DIM)).astype(np.float32)
    word_idfs = np.abs(rng.standard_normal(NUM_WORDS)).astype(np.float32)
    template_descs = np.abs(
        rng.standard_normal((NUM_TEMPLATES, NUM_WORDS))
    ).astype(np.float32)
    template_descs /= np.linalg.norm(template_descs, axis=1, keepdims=True)
    # ~400 valid features per template at PCA_DIM, as in LM-O repre banks
    tpl_feats = [
        rng.standard_normal((400, PCA_DIM)).astype(np.float32)
        for _ in range(NUM_TEMPLATES)
    ]
    tpl_vertices = [
        rng.uniform(-0.05, 0.05, (400, 3)).astype(np.float32)
        for _ in range(NUM_TEMPLATES)
    ]
    pca = PCA(n_components=PCA_DIM)
    pca.fit(rng.standard_normal((4096, RAW_DIM)).astype(np.float32))
    words_nn = NearestNeighbors(n_neighbors=3, algorithm="brute").fit(word_centroids)
    # reference: per-template KNN(k=1).fit(template_feats) x798 (infer.py:226-239)
    tpl_nn = [
        NearestNeighbors(n_neighbors=1, algorithm="brute").fit(f) for f in tpl_feats
    ]

    # --- synthetic test image + camera for the warp stage ---
    full_img = rng.integers(0, 255, (476, 630, 3), dtype=np.uint8)
    K = np.array([[600.0, 0, 315], [0, 600.0, 238], [0, 0, 1]], np.float32)

    stages = {
        k: 0.0
        for k in (
            "warp",
            "vit",
            "grid_sample",
            "pca",
            "words",
            "tfidf_retrieval",
            "buddies",
            "pnp",
        )
    }

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] += time.perf_counter() - t0
        return out

    n_crops = 6
    t_total0 = time.perf_counter()
    for ci in range(n_crops):
        # 1. crop warp: full backward map + cv2.remap x2 (image+mask),
        #    reference misc.py:458-519 via infer.py:438-449
        def do_warp():
            map_x, map_y = np.meshgrid(
                np.linspace(100, 500, CROP, dtype=np.float32),
                np.linspace(30, 430, CROP, dtype=np.float32),
            )
            crop = cv2.remap(full_img, map_x, map_y, cv2.INTER_LINEAR)
            mask = cv2.remap(
                (full_img[..., 0] > 64).astype(np.uint8), map_x, map_y,
                cv2.INTER_NEAREST,
            )
            return crop, mask

        crop, mask = timed("warp", do_warp)

        # 2. ViT forward, batch 1 (reference infer.py:470, dinov2_utils.py:115)
        x = torch.from_numpy(
            crop.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
        )

        def do_vit():
            with torch.no_grad():
                out = model(x, output_hidden_states=True)
            # layer-9 patch tokens (reference captures block 9 via hook)
            return out.hidden_states[9][:, 1:, :]

        tokens = timed("vit", do_vit)
        fmap = tokens.reshape(1, GRID, GRID, RAW_DIM).permute(0, 3, 1, 2)

        # 3. grid_sample at masked grid points (feature_util.py:100-131)
        def do_gs():
            pts = (
                torch.from_numpy(
                    rng.uniform(-1, 1, (1, 1, 420, 2)).astype(np.float32)
                )
            )
            return F.grid_sample(fmap, pts, align_corners=False)[0, :, 0].T

        q_raw = timed("grid_sample", do_gs).numpy()

        # 4. PCA project (projector_util.py:66-69: tensor->numpy->sklearn->tensor)
        q = timed("pca", lambda: pca.transform(q_raw).astype(np.float32))

        # 5. visual-word kNN k=3 (knn_util.py:65-79 CPU round trip)
        w_dist, w_ids = timed("words", lambda: words_nn.kneighbors(q))

        # 6. tf-idf + cosine similarity vs 798 descs, top-5
        #    (template_util.py:31-71,126-176)
        def do_tfidf():
            hist = np.zeros(NUM_WORDS, np.float32)
            np.add.at(hist, w_ids.ravel(), 1.0)
            desc = hist * word_idfs
            desc /= max(np.linalg.norm(desc), 1e-9)
            sims = template_descs @ desc
            return np.argsort(-sims)[:TOP_N_TEMPLATES]

        top_ids = timed("tfidf_retrieval", do_tfidf)

        # 7. cyclic buddies per retrieved template (corresp_util.py:34-70):
        #    query->template NN + template->query NN, cycle distance, top-300
        def do_buddies():
            q_nn = NearestNeighbors(n_neighbors=1, algorithm="brute").fit(q)
            out = []
            for tid in top_ids:
                d1, i1 = tpl_nn[tid].kneighbors(q)  # query -> template
                d2, i2 = q_nn.kneighbors(tpl_feats[tid][i1[:, 0]])  # back
                u = rng.uniform(0, CROP, (len(q), 2))
                cyc = np.linalg.norm(u - u[i2[:, 0]], axis=1)
                sel = np.argsort(cyc)[:NUM_BUDDIES]
                out.append((tid, sel, i1[sel, 0]))
            return out

        corresp = timed("buddies", do_buddies)

        # 8. PnP-RANSAC + LM per template, best by inlier count
        #    (pnp_util.py:46-74, infer.py:567-602)
        def do_pnp():
            best = None
            for tid, sel, tidx in corresp:
                obj = tpl_vertices[tid][tidx].astype(np.float64)
                img_pts = rng.uniform(0, CROP, (len(sel), 2)).astype(np.float64)
                ok, rvec, tvec, inl = cv2.solvePnPRansac(
                    obj, img_pts, K.astype(np.float64), None,
                    iterationsCount=RANSAC_ITERS, reprojectionError=10.0,
                    confidence=0.99, flags=cv2.SOLVEPNP_ITERATIVE,
                )
                if ok and inl is not None and len(inl) >= 6:
                    rvec, tvec = cv2.solvePnPRefineLM(
                        obj[inl[:, 0]], img_pts[inl[:, 0]],
                        K.astype(np.float64), None, rvec, tvec,
                    )
                    n = len(inl)
                    if best is None or n > best[0]:
                        best = (n, rvec, tvec)
            return best

        timed("pnp", do_pnp)

    total = time.perf_counter() - t_total0
    per_crop = {k: v / n_crops for k, v in stages.items()}
    measured_cps = n_crops / total

    # Reference-favoring adjusted estimate (see module docstring + BASELINE.md)
    cpu_stages = sum(v for k, v in per_crop.items() if k != "vit")
    adjusted_per_crop = ADJ_VIT_S + cpu_stages * ADJ_CPU_SCALE
    adjusted_cps = 1.0 / adjusted_per_crop

    result = {
        "metric": "reference_replica_crops_per_sec",
        "measured_this_host": round(measured_cps, 3),
        "host": "1-core CPU, torch-cpu",
        "stage_seconds_per_crop": {k: round(v, 4) for k, v in per_crop.items()},
        "adjusted_reference_estimate": round(adjusted_cps, 3),
        "adjustment": {
            "vit_gpu_seconds": ADJ_VIT_S,
            "cpu_scale": ADJ_CPU_SCALE,
        },
        "n_crops": n_crops,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
