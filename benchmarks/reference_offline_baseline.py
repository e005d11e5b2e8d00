"""Measured stand-in for the reference pipeline's OFFLINE per-object cost.

Companion to benchmarks/reference_baseline.py (the online per-crop replica):
this measures the two offline stages the reference runs once per object,
whose hot loops are one pyrender call and one torch ViT forward PER TEMPLATE
(~798 templates/object at the published LM-O configuration):

gen_templates (reference: scripts/gen_templates.py:237-474, per view):
  render color/depth/mask at SSAA resolution (pyrender/OpenGL)
  -> calc_2d_box / calc_crop_box / construct_crop_camera (numpy)
  -> warp_image x2 + warp_depth_image (full backward map + cv2.remap,
     misc.py:458-556) at crop_size * ssaa = 1680x1680
  -> SSAA downsample x3 (cv2.resize, misc resize_image)
  -> save rgb/depth/mask PNGs (bop inout)

gen_repre (reference: scripts/gen_repre.py:107-217 + 272-346, per object):
  PER TEMPLATE: load 3 PNGs -> 5x5 mask erosion (kornia; cv2.erode here)
  -> grid + depth lifting (numpy) -> torch ViT-S forward, batch 1
  -> grid_sample; then PCA fit (sklearn, <=100k samples) -> k-means 2048
  (faiss.Kmeans, 50 iters; sklearn KMeans with random init here — faiss
  also random-inits) -> per-template tf-idf word search.

OpenGL is not available on this host, so the render itself is GRANTED at a
generous 5 ms/view (offscreen EGL of a single textured mesh) rather than
measured; everything else is measured. The per-template loops are measured
over a few iterations and extrapolated linearly (they are embarrassingly
repetitive); k-means is measured on a subsample for a few Lloyd iterations
and extrapolated linearly in samples x iterations (Lloyd is linear in
both). Adjustments in the reference's favor, as in BASELINE.md: ViT forward
at 8 ms on a datacenter GPU, k-means granted a faiss-gpu at 100x this
host's single core, all other CPU stages / 8 for an 8-core workstation.

Prints one JSON line with measured + adjusted per-object seconds and the
adjusted reference templates/sec for both stages.
"""

import json
import sys
import time

import numpy as np

NUM_TEMPLATES = 798
CROP = 420
SSAA = 4
RENDER_W, RENDER_H = 2520, 1904  # dataset camera (630x476) x SSAA
NUM_WORDS = 2048
PCA_DIM = 256
RAW_DIM = 384
FEATS_PER_TEMPLATE = 400  # valid masked grid features, LM-O scale

ADJ_RENDER_S = 0.005  # granted GL render per view
ADJ_VIT_S = 0.008  # granted GPU ViT forward per template
ADJ_CPU_SCALE = 1.0 / 8.0
ADJ_KMEANS_GPU_SPEEDUP = 100.0  # granted faiss-gpu vs this 1-core host


def build_torch_vit():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=RAW_DIM, num_hidden_layers=12, num_attention_heads=6,
        intermediate_size=4 * RAW_DIM, patch_size=14, image_size=518,
    )
    model = Dinov2Model(cfg)
    model.eval()
    return model


def measure_gen_templates_view(rng, cv2):
    """One per-view iteration of the gen_templates hot loop (minus the
    granted GL render). Returns stage seconds for this view."""
    big = CROP * SSAA  # 1680
    color = rng.integers(0, 255, (RENDER_H, RENDER_W, 3), dtype=np.uint8)
    depth = rng.uniform(500, 1500, (RENDER_H, RENDER_W)).astype(np.float32)
    mask = (depth > 900).astype(np.uint8) * 255
    stages = {}

    t0 = time.perf_counter()
    # Backward map via camera math over every dst pixel (misc.py:458-519:
    # unproject dst grid -> world -> project into src camera).
    ys, xs = np.meshgrid(
        np.arange(big, dtype=np.float32), np.arange(big, dtype=np.float32),
        indexing="ij",
    )
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(big * big, np.float32)], 1)
    k_dst_inv = np.array(
        [[1 / 2400.0, 0, -0.35], [0, 1 / 2400.0, -0.35], [0, 0, 1]],
        np.float32,
    )
    rays = pts @ k_dst_inv.T
    r_rel = np.array(
        [[0.999, -0.02, 0.01], [0.02, 0.999, -0.03], [-0.01, 0.03, 0.999]],
        np.float32,
    )
    rays = rays @ r_rel.T
    k_src = np.array(
        [[600.0 * SSAA, 0, RENDER_W / 2], [0, 600.0 * SSAA, RENDER_H / 2],
         [0, 0, 1]], np.float32,
    )
    proj = rays @ k_src.T
    map_x = (proj[:, 0] / proj[:, 2]).reshape(big, big).astype(np.float32)
    map_y = (proj[:, 1] / proj[:, 2]).reshape(big, big).astype(np.float32)
    stages["warp_map_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    color_w = cv2.remap(color, map_x, map_y, cv2.INTER_LINEAR)
    mask_w = cv2.remap(mask, map_x, map_y, cv2.INTER_NEAREST)
    # warp_depth_image additionally re-projects depth along the new rays
    # (misc.py:522-556): remap + per-pixel scale.
    depth_w = cv2.remap(depth, map_x, map_y, cv2.INTER_NEAREST)
    norm = np.linalg.norm(rays, axis=1).reshape(big, big)
    depth_w = depth_w * (norm / np.maximum(rays[:, 2].reshape(big, big), 1e-6))
    stages["remap_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    color_s = cv2.resize(color_w, (CROP, CROP), interpolation=cv2.INTER_AREA)
    depth_s = cv2.resize(depth_w, (CROP, CROP), interpolation=cv2.INTER_NEAREST)
    mask_s = cv2.resize(mask_w, (CROP, CROP), interpolation=cv2.INTER_NEAREST)
    stages["resize_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ok1, rgb_png = cv2.imencode(".png", color_s)
    ok2, depth_png = cv2.imencode(".png", depth_s.astype(np.uint16))
    ok3, mask_png = cv2.imencode(".png", mask_s)
    assert ok1 and ok2 and ok3
    stages["png_s"] = time.perf_counter() - t0
    stages["_pngs"] = (rgb_png, depth_png, mask_png)
    return stages


def main():
    import cv2
    import torch
    import torch.nn.functional as F
    from sklearn.cluster import KMeans
    from sklearn.decomposition import PCA
    from sklearn.neighbors import NearestNeighbors

    torch.set_num_threads(1)
    rng = np.random.default_rng(0)
    report = {"metric": "reference_offline_baseline",
              "host": "1-core CPU, torch-cpu"}

    # ---- gen_templates ----------------------------------------------------
    n_views = 4
    tpl_stages = None
    pngs = None
    for i in range(n_views + 1):
        s = measure_gen_templates_view(rng, cv2)
        pngs = s.pop("_pngs")
        if i == 0:
            continue  # warmup (allocator, cv2 thread pool)
        tpl_stages = s if tpl_stages is None else {
            k: tpl_stages[k] + v for k, v in s.items()
        }
    tpl_stages = {k: v / n_views for k, v in tpl_stages.items()}
    per_view_cpu = sum(tpl_stages.values())
    gen_templates_meas = NUM_TEMPLATES * per_view_cpu  # + unmeasured GL
    gen_templates_adj = NUM_TEMPLATES * (
        ADJ_RENDER_S + per_view_cpu * ADJ_CPU_SCALE
    )
    report["gen_templates"] = {
        "per_view_cpu_s": {k: round(v, 4) for k, v in tpl_stages.items()},
        "measured_cpu_s_per_object_excl_render": round(gen_templates_meas, 1),
        "adjusted_s_per_object": round(gen_templates_adj, 1),
        "adjusted_templates_per_s": round(NUM_TEMPLATES / gen_templates_adj, 2),
    }
    print(f"[offline] gen_templates: {report['gen_templates']}",
          file=sys.stderr)

    # ---- gen_repre: per-template registration loop ------------------------
    model = build_torch_vit()
    n_reps = 3
    reg = {"load_s": 0.0, "erode_grid_lift_s": 0.0, "vit_s": 0.0,
           "grid_sample_s": 0.0}
    for i in range(n_reps + 1):
        t0 = time.perf_counter()
        color = cv2.imdecode(pngs[0], cv2.IMREAD_COLOR)
        depth = cv2.imdecode(pngs[1], cv2.IMREAD_ANYDEPTH).astype(np.float32)
        mask = cv2.imdecode(pngs[2], cv2.IMREAD_GRAYSCALE)
        t1 = time.perf_counter()
        mask_e = cv2.erode(mask, np.ones((5, 5), np.uint8))
        gy, gx = np.meshgrid(
            np.arange(7, CROP, 14, dtype=np.float32),
            np.arange(7, CROP, 14, dtype=np.float32), indexing="ij",
        )
        pts = np.stack([gx.ravel(), gy.ravel()], 1)
        valid = mask_e[pts[:, 1].astype(int), pts[:, 0].astype(int)] > 0
        pts_v = pts[valid]
        z = depth[pts_v[:, 1].astype(int), pts_v[:, 0].astype(int)]
        xyz = np.stack(
            [(pts_v[:, 0] - 210.0) * z / 600.0,
             (pts_v[:, 1] - 210.0) * z / 600.0, z], 1,
        )
        r = np.eye(3, dtype=np.float32)
        _ = xyz @ r.T + np.array([0, 0, -900.0], np.float32)
        t2 = time.perf_counter()
        x = torch.from_numpy(
            color.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
        )
        with torch.no_grad():
            out = model(x, output_hidden_states=True)
        tokens = out.hidden_states[9][:, 1:, :]
        t3 = time.perf_counter()
        fmap = tokens.reshape(1, 30, 30, RAW_DIM).permute(0, 3, 1, 2)
        grid_pts = torch.from_numpy(
            (pts_v / (CROP / 2.0) - 1.0).astype(np.float32)
        )[None, None]
        _ = F.grid_sample(fmap, grid_pts, align_corners=False)
        t4 = time.perf_counter()
        if i == 0:
            continue  # warmup
        reg["load_s"] += t1 - t0
        reg["erode_grid_lift_s"] += t2 - t1
        reg["vit_s"] += t3 - t2
        reg["grid_sample_s"] += t4 - t3
    reg = {k: v / n_reps for k, v in reg.items()}
    reg_cpu = sum(v for k, v in reg.items() if k != "vit_s")
    registration_meas = NUM_TEMPLATES * (reg_cpu + reg["vit_s"])
    registration_adj = NUM_TEMPLATES * (
        ADJ_VIT_S + reg_cpu * ADJ_CPU_SCALE
    )
    print(f"[offline] registration per-template: "
          f"{ {k: round(v, 4) for k, v in reg.items()} }", file=sys.stderr)

    # ---- gen_repre: PCA fit (measured at the real cap) ---------------------
    n_feats = NUM_TEMPLATES * FEATS_PER_TEMPLATE
    fit_n = min(100_000, n_feats)
    raw = rng.standard_normal((fit_n, RAW_DIM)).astype(np.float32)
    t0 = time.perf_counter()
    pca = PCA(n_components=PCA_DIM)
    pca.fit(raw)
    pca_s = time.perf_counter() - t0
    # transform of the full bank (gen_repre.py:283-284)
    full = rng.standard_normal((n_feats, RAW_DIM)).astype(np.float32)
    t0 = time.perf_counter()
    feats = pca.transform(full).astype(np.float32)
    pca_s += time.perf_counter() - t0
    print(f"[offline] pca fit+transform: {pca_s:.1f}s", file=sys.stderr)

    # ---- gen_repre: k-means 2048 x 50 Lloyd iters (extrapolated) ----------
    sub_n, sub_iters = 16_384, 3
    km = KMeans(n_clusters=NUM_WORDS, init="random", n_init=1,
                max_iter=sub_iters, tol=0.0, algorithm="lloyd",
                random_state=0)
    t0 = time.perf_counter()
    km.fit(feats[:sub_n])
    km_sub_s = time.perf_counter() - t0
    iters_run = int(km.n_iter_)
    kmeans_meas = km_sub_s * (n_feats / sub_n) * (50.0 / max(iters_run, 1))
    print(f"[offline] kmeans subsample {sub_n}x{iters_run} iters: "
          f"{km_sub_s:.1f}s -> extrapolated {kmeans_meas:.1f}s",
          file=sys.stderr)

    # ---- gen_repre: per-template tf-idf word search ------------------------
    words_nn = NearestNeighbors(n_neighbors=3, algorithm="brute").fit(
        km.cluster_centers_
    )
    n_rep_tfidf = 8
    t0 = time.perf_counter()
    for t in range(n_rep_tfidf):
        q = feats[t * FEATS_PER_TEMPLATE:(t + 1) * FEATS_PER_TEMPLATE]
        words_nn.kneighbors(q)
    tfidf_meas = (time.perf_counter() - t0) / n_rep_tfidf * NUM_TEMPLATES
    print(f"[offline] tfidf word search: {tfidf_meas:.1f}s/object",
          file=sys.stderr)

    repre_meas = registration_meas + pca_s + kmeans_meas + tfidf_meas
    repre_adj = (
        registration_adj
        + pca_s * ADJ_CPU_SCALE
        + kmeans_meas / ADJ_KMEANS_GPU_SPEEDUP
        + tfidf_meas * ADJ_CPU_SCALE
    )
    report["gen_repre"] = {
        "per_template_s": {k: round(v, 4) for k, v in reg.items()},
        "pca_s": round(pca_s, 1),
        "kmeans_s_extrapolated": round(kmeans_meas, 1),
        "tfidf_s": round(tfidf_meas, 1),
        "measured_s_per_object": round(repre_meas, 1),
        "adjusted_s_per_object": round(repre_adj, 1),
        "adjusted_templates_per_s": round(NUM_TEMPLATES / repre_adj, 2),
    }
    report["adjustment"] = {
        "render_gl_s_per_view": ADJ_RENDER_S,
        "vit_gpu_s": ADJ_VIT_S,
        "cpu_scale": ADJ_CPU_SCALE,
        "kmeans_gpu_speedup": ADJ_KMEANS_GPU_SPEEDUP,
    }
    report["adjusted_total_s_per_object"] = round(
        gen_templates_adj + repre_adj, 1
    )
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
