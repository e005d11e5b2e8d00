"""Host-inclusive infer-CLI throughput on a synthetic BOP split ON DISK.

What bench.py's headline deliberately excludes, this measures: the wall
crops/sec the infer CLI actually sustains with PNG image IO, detection
loading, per-detection crop-camera math, warps, the jitted pipeline, and
evaluator accumulation all in the loop — the analog of the reference's
per-stage wall logging that includes prep for every instance
(reference: scripts/infer.py:636-645).

The split is generated once into --workdir (default benchmarks/_cli_bench):
VGA-ish images with several rendered object instances each, CNOS-format
detections with RLE masks, and an LM-O-scale object representation
(798 templates x 512 features, 2048 words) so the device step matches the
headline bench's program. First run compiles (persistent XLA cache makes
reruns warm); the timed number is a second infer() pass.

Usage: python benchmarks/cli_throughput.py [--images 40] [--dets 4]
Prints one JSON line {"metric": "cli_crops_per_sec", ...}.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OBJ_ID = 1
IMG_W, IMG_H = 644, 476  # ViT-14-divisible center-crop target sizes
EXTRACTOR = "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_norm=1"


def _make_mesh():
    from foundpose_tpu.data.ply import Mesh

    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float32,
    )
    v = v / np.linalg.norm(v[0]) * 40.0
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int32,
    )
    rng = np.random.default_rng(7)
    colors = rng.integers(40, 255, size=(len(v), 3)).astype(np.uint8)
    return Mesh(vertices=v, faces=f, colors=colors)


def _rle_encode(mask):
    """COCO uncompressed column-major RLE (what data/detections.py parses)."""
    flat = mask.astype(bool).T.flatten()
    counts, run_val, run = [], False, 0
    for vv in flat:
        if bool(vv) == run_val:
            run += 1
        else:
            counts.append(run)
            run_val = bool(vv)
            run = 1
    counts.append(run)
    return counts


def build_split(workdir: str, n_images: int, dets_per_image: int) -> str:
    """Synthetic BOP split: one scene, n_images PNGs on disk, each with
    dets_per_image rendered instances + GT + CNOS detections."""
    from PIL import Image

    from foundpose_tpu.data.ply import save_ply
    from foundpose_tpu.renderer.base import RendererType, RenderType, build
    from foundpose_tpu.structs import PinholeCamera

    mesh = _make_mesh()
    bop_root = os.path.join(workdir, "bop")
    ds = os.path.join(bop_root, "demo", "test", "000001")
    os.makedirs(os.path.join(ds, "rgb"), exist_ok=True)
    models = os.path.join(bop_root, "demo", "models")
    os.makedirs(models, exist_ok=True)
    save_ply(os.path.join(models, f"obj_{OBJ_ID:06d}.ply"), mesh)
    diameter = float(
        np.linalg.norm(mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0))
    )
    with open(os.path.join(models, "models_info.json"), "w") as f:
        json.dump({str(OBJ_ID): {"diameter": diameter}}, f)

    K = np.array(
        [[600.0, 0, IMG_W / 2 - 0.5], [0, 600.0, IMG_H / 2 - 0.5], [0, 0, 1.0]]
    )
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(OBJ_ID, mesh)

    rng = np.random.default_rng(0)
    scene_cam, scene_gt, scene_gt_info, detections = {}, {}, {}, []
    for im_id in range(n_images):
        rgb = rng.integers(0, 60, size=(IMG_H, IMG_W, 3)).astype(np.uint8)
        gts, infos = [], []
        for inst in range(dets_per_image):
            # Random orientation; translation spreads instances across the
            # image (screen-space offset via x/y at ~450mm depth).
            a, b, c = rng.uniform(0, 2 * np.pi, 3)
            from scipy.spatial.transform import Rotation

            r_m2c = Rotation.from_euler("xyz", [a, b, c]).as_matrix()
            t_m2c = np.array(
                [rng.uniform(-120, 120), rng.uniform(-80, 80),
                 rng.uniform(400, 520)]
            )
            t_w2c = np.eye(4)
            t_w2c[:3, :3] = r_m2c
            t_w2c[:3, 3] = t_m2c
            cam = PinholeCamera.create(
                f=(K[0, 0], K[1, 1]), c=(K[0, 2], K[1, 2]),
                width=IMG_W, height=IMG_H,
                T_world_from_eye=np.linalg.inv(t_w2c),
            )
            out = renderer.render_object_model(OBJ_ID, cam)
            inst_rgb = (255 * np.clip(np.asarray(out[RenderType.COLOR]), 0, 1)).astype(np.uint8)
            mask = np.asarray(out[RenderType.MASK]) > 0
            if mask.sum() < 200:
                continue
            rgb[mask] = inst_rgb[mask]
            ys, xs = np.nonzero(mask)
            box = [int(xs.min()), int(ys.min()),
                   int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
            gts.append(
                {
                    "obj_id": OBJ_ID,
                    "cam_R_m2c": r_m2c.flatten().tolist(),
                    "cam_t_m2c": t_m2c.tolist(),
                }
            )
            infos.append(
                {"bbox_obj": box, "bbox_visib": box, "visib_fract": 1.0}
            )
            detections.append(
                {
                    "scene_id": 1,
                    "image_id": im_id,
                    "category_id": OBJ_ID,
                    "score": float(rng.uniform(0.5, 1.0)),
                    "bbox": box,
                    "time": 0.05,
                    "segmentation": {
                        "counts": _rle_encode(mask),
                        "size": [IMG_H, IMG_W],
                    },
                }
            )
        Image.fromarray(rgb).save(
            os.path.join(ds, "rgb", f"{im_id:06d}.png")
        )
        scene_cam[str(im_id)] = {
            "cam_K": K.flatten().tolist(), "depth_scale": 0.1
        }
        scene_gt[str(im_id)] = gts
        scene_gt_info[str(im_id)] = infos

    for name, obj in (
        ("scene_camera.json", scene_cam),
        ("scene_gt.json", scene_gt),
        ("scene_gt_info.json", scene_gt_info),
    ):
        with open(os.path.join(ds, name), "w") as f:
            json.dump(obj, f)
    det_path = os.path.join(workdir, "detections.json")
    with open(det_path, "w") as f:
        json.dump(detections, f)
    return bop_root, det_path


def build_repre(workdir: str) -> str:
    """REAL object representation at the LM-O configuration: gen_templates
    (57 viewpoints x 14 in-plane = 798 templates at 420px) + gen_repre with
    the SAME deterministic ViT-S weights infer() will use (both stages seed
    init_params with PRNGKey(0) when no checkpoint is given) — so the timed
    infer() pass produces genuine poses, not chance matches against an
    unrelated bank."""
    from foundpose_tpu.pipeline import gen_repre as gen_repre_mod
    from foundpose_tpu.pipeline import gen_templates as gen_templates_mod

    bop_root = os.path.join(workdir, "bop")
    tpl_opts = gen_templates_mod.GenTemplatesOpts(
        object_dataset="demo",
        object_lids=[OBJ_ID],
        depth_range=(400.0, 520.0),  # the split's instance depth range
        crop_size=(420, 420),
        bop_root=bop_root,
        output_dir=os.path.join(workdir, "templates"),
        overwrite=True,
    )
    gen_templates_mod.synthesize_templates(tpl_opts)
    repre_opts = gen_repre_mod.GenRepreOpts(
        object_dataset="demo",
        object_lids=[OBJ_ID],
        extractor_name=EXTRACTOR,
        use_pallas_attention=True,
        use_fused_block=True,
        approx_gelu=True,
        batch_size=32,
        templates_dir=os.path.join(workdir, "templates"),
        output_dir=os.path.join(workdir, "repre"),
        overwrite=True,
    )
    gen_repre_mod.generate_repre_from_list(repre_opts)
    return os.path.join(workdir, "repre")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=40)
    ap.add_argument("--dets", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument(
        "--workdir",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "_cli_bench"),
    )
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the on-disk split")
    args = ap.parse_args()

    from foundpose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    stamp = os.path.join(args.workdir, "stamp.json")
    # "repre" versions the split recipe: bump to invalidate cached workdirs
    # built with an older build_repre (e.g. the pre-round-3 synthetic bank).
    want = {"images": args.images, "dets": args.dets, "repre": "gen-v2"}
    if args.regen or not os.path.exists(stamp) or json.load(open(stamp)) != want:
        if os.path.isdir(args.workdir):
            shutil.rmtree(args.workdir)
        os.makedirs(args.workdir, exist_ok=True)
        t0 = time.perf_counter()
        build_split(args.workdir, args.images, args.dets)
        build_repre(args.workdir)
        json.dump(want, open(stamp, "w"))
        print(f"[cli-bench] split generated in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    bop_root = os.path.join(args.workdir, "bop")
    det_path = os.path.join(args.workdir, "detections.json")
    repre_dir = os.path.join(args.workdir, "repre")

    from foundpose_tpu.pipeline import infer as infer_mod

    out_dir = os.path.join(args.workdir, "out")

    def run_once():
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        opts = infer_mod.InferOpts(
            object_dataset="demo",
            object_lids=[OBJ_ID],
            extractor_name=EXTRACTOR,
            crop_size=(420, 420),
            use_pallas_attention=True,
            use_fused_block=True,
            approx_gelu=True,
            approx_topk=True,
            compute_dtype="bfloat16",
            vit_overrides={"softmax_stabilizer": "capped"},
            batch_size=args.batch,
            num_preds_factor=float(args.dets),
            dataset_crop_size=(IMG_W, IMG_H),
            bop_root=bop_root,
            repre_dir=repre_dir,
            detections_path=det_path,
            output_dir=out_dir,
        )
        t0 = time.perf_counter()
        counts = infer_mod.infer(opts)
        wall = time.perf_counter() - t0
        n = sum(counts.values())
        results = json.load(
            open(os.path.join(out_dir, "demo", "v1", str(OBJ_ID),
                              "estimated-poses.json"))
        )
        return wall, n, results

    print("[cli-bench] warmup pass (compiles; persistent cache)…",
          file=sys.stderr)
    w0, n0, _ = run_once()
    print(f"[cli-bench] warmup: {n0} crops in {w0:.1f}s", file=sys.stderr)
    wall, n, results = run_once()
    cps = n / wall
    # Per-stage medians over the successful estimates (each carries the
    # reference-style per-instance times dict, scripts/infer.py:636-645).
    stages = {}
    for r in results:
        for k, v in (r.get("time") or {}).items():
            stages.setdefault(k, []).append(float(v))
    print(
        json.dumps(
            {
                "metric": "cli_crops_per_sec",
                "value": round(cps, 2),
                "unit": "crops/sec (host-inclusive: PNG IO + prep + warp + "
                        "pipeline + evaluator)",
                "crops": n,
                "success_rate": round(len(results) / max(n, 1), 3),
                "wall_s": round(wall, 2),
                "images": args.images,
                "batch": args.batch,
                "stage_median_s": {
                    k: round(float(np.median(v)), 4)
                    for k, v in sorted(stages.items())
                },
            }
        )
    )


if __name__ == "__main__":
    main()
