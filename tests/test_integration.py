"""Full-framework integration test: a synthetic BOP dataset goes through
gen_templates -> gen_repre -> infer -> prepare_bop_submission, and the
recovered pose must match the ground truth."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from foundpose_tpu.data.ply import Mesh, save_ply
from foundpose_tpu.pipeline import gen_repre as gen_repre_mod
from foundpose_tpu.pipeline import gen_templates as gen_templates_mod
from foundpose_tpu.pipeline import infer as infer_mod
from foundpose_tpu.pipeline import prepare_bop_submission as bop_sub_mod


OBJ_ID = 1
TINY_EXTRACTOR = "dinov2_version=vits14-reg_stride=14_facet=token_layer=1_norm=1"


def make_textured_icosahedron(scale=40.0):
    """An icosahedron with distinctive vertex colors (mm units)."""
    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float32,
    )
    v = v / np.linalg.norm(v[0]) * scale
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


def build_synthetic_bop(tmp_path, mesh):
    """Creates a minimal BOP dataset with one scene and one test image whose
    object pose equals one of the template viewpoints."""
    from foundpose_tpu.renderer.base import RendererType, RenderType, build
    from foundpose_tpu.structs import PinholeCamera
    from foundpose_tpu import cameras as cam_mod

    bop_root = tmp_path / "bop"
    ds = bop_root / "demo" / "test" / "000001"
    (ds / "rgb").mkdir(parents=True)
    (ds / "depth").mkdir(parents=True)
    models = bop_root / "demo" / "models"
    models.mkdir(parents=True)

    save_ply(str(models / f"obj_{OBJ_ID:06d}.ply"), mesh)
    diameter = float(
        np.linalg.norm(
            mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
        )
    )
    (models / "models_info.json").write_text(
        json.dumps({str(OBJ_ID): {"diameter": diameter}})
    )

    # GT pose: one of the fibonacci views at radius 300mm, slightly perturbed
    # in-plane so it is not bitwise-identical to a template.
    views = cam_mod.sample_views(9, radius=300.0)
    view = views[3]
    r_gt = view["R"]
    t_gt = view["t"].flatten()

    K = np.array([[300.0, 0, 113.5], [0, 300.0, 113.5], [0, 0, 1.0]])
    w = h = 228  # divisible by patch 14 + small

    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(OBJ_ID, mesh)
    t_w2c = np.eye(4)
    t_w2c[:3, :3] = r_gt
    t_w2c[:3, 3] = t_gt
    cam = PinholeCamera.create(
        f=(K[0, 0], K[1, 1]), c=(K[0, 2], K[1, 2]), width=w, height=h,
        T_world_from_eye=np.linalg.inv(t_w2c),
    )
    out = renderer.render_object_model(OBJ_ID, cam)
    rgb = (255 * np.clip(np.asarray(out[RenderType.COLOR]), 0, 1)).astype(np.uint8)
    depth = np.asarray(out[RenderType.DEPTH])
    mask = np.asarray(out[RenderType.MASK])
    assert mask.sum() > 100

    Image.fromarray(rgb).save(ds / "rgb" / "000000.png")
    gen_templates_mod.save_depth_png(str(ds / "depth" / "000000.png"), depth)

    (ds / "scene_camera.json").write_text(
        json.dumps({"0": {"cam_K": K.flatten().tolist(), "depth_scale": 0.1}})
    )
    (ds / "scene_gt.json").write_text(
        json.dumps(
            {
                "0": [
                    {
                        "obj_id": OBJ_ID,
                        "cam_R_m2c": r_gt.flatten().tolist(),
                        "cam_t_m2c": t_gt.tolist(),
                    }
                ]
            }
        )
    )
    ys, xs = np.nonzero(mask)
    box = [int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1),
           int(ys.max() - ys.min() + 1)]
    (ds / "scene_gt_info.json").write_text(
        json.dumps({"0": [{"bbox_obj": box, "bbox_visib": box, "visib_fract": 1.0}]})
    )

    # CNOS-style detections file (uncompressed RLE, column-major).
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
    det = {
        "scene_id": 1, "image_id": 0, "category_id": OBJ_ID, "score": 0.99,
        "bbox": box, "time": 0.1,
        "segmentation": {"counts": counts, "size": [h, w]},
    }
    det_path = tmp_path / "detections.json"
    det_path.write_text(json.dumps([det]))
    return str(bop_root), str(det_path), r_gt, t_gt


@pytest.mark.slow
def test_full_framework_end_to_end(tmp_path):
    mesh = make_textured_icosahedron()
    bop_root, det_path, r_gt, t_gt = build_synthetic_bop(tmp_path, mesh)

    # 1. gen_templates (small view set, small crops).
    tpl_opts = gen_templates_mod.GenTemplatesOpts(
        object_dataset="demo",
        object_lids=[OBJ_ID],
        min_num_viewpoints=9,
        num_inplane_rotations=4,
        depth_range=(300.0, 300.0),
        ssaa_factor=2.0,
        crop_size=(140, 140),
        bop_root=bop_root,
        output_dir=str(tmp_path / "templates"),
        overwrite=True,
    )
    gen_templates_mod.synthesize_templates(tpl_opts)
    tpl_dir = tmp_path / "templates" / "demo" / "v1" / str(OBJ_ID)
    metadata = json.loads((tpl_dir / "metadata.json").read_text())
    assert len(metadata) >= 30
    # Template images exist and are crop-sized.
    img = np.asarray(Image.open(metadata[0]["rgb_image_path"]))
    assert img.shape[:2] == (140, 140)

    # Shrink the ViT for test speed via the opts-level injection seam
    # (vit_overrides; no module-global monkey-patching).
    VIT_OVERRIDES = {"embed_dim": 32, "depth": 2, "num_heads": 2, "pos_grid": 10}

    # 2. gen_repre with a tiny random ViT (deterministic features).
    repre_opts = gen_repre_mod.GenRepreOpts(
        object_dataset="demo",
        object_lids=[OBJ_ID],
        extractor_name=TINY_EXTRACTOR,
        apply_pca=True,
        pca_components=16,
        cluster_num=64,
        batch_size=8,
        vit_overrides=VIT_OVERRIDES,
        templates_dir=str(tmp_path / "templates"),
        output_dir=str(tmp_path / "repre"),
        overwrite=True,
    )
    gen_repre_mod.generate_repre_from_list(repre_opts)

    repre_dir = tmp_path / "repre" / "demo" / "v1" / str(OBJ_ID)
    assert (repre_dir / "repre.npz").exists()

    # 3. infer. The test image is 228px; dataset_crop_size caps the
    # center-crop below the 630x476 default.
    infer_opts = infer_mod.InferOpts(
        object_dataset="demo",
        object_lids=[OBJ_ID],
        extractor_name=TINY_EXTRACTOR,
        crop_size=(140, 140),
        match_top_n_templates=3,
        match_top_k_buddies=50,
        pnp_ransac_iter=200,
        batch_size=2,
        vis_results=True,
        vis_count=2,
        vit_overrides=VIT_OVERRIDES,
        dataset_crop_size=(224, 224),
        bop_root=bop_root,
        repre_dir=str(tmp_path / "repre"),
        detections_path=det_path,
        output_dir=str(tmp_path / "inference"),
    )
    import foundpose_tpu.pipeline.infer as inf

    inf.infer(infer_opts)

    results_path = tmp_path / "inference" / "demo" / "v1" / str(OBJ_ID) / "estimated-poses.json"
    assert results_path.exists()
    results = json.loads(results_path.read_text())
    assert len(results) == 1
    vis_dir = tmp_path / "inference" / "demo" / "v1" / str(OBJ_ID) / "vis"
    assert any(vis_dir.glob("*.png"))
    # Vertex-error point cloud + score histogram were exported
    # (reference: utils/vis_util.py:78-124, vis_base_util histograms).
    assert any(vis_dir.glob("*_error.ply"))
    assert (vis_dir / "score_hist.png").exists()
    # Reference-layout metric table exists alongside estimated-poses.json.
    assert (results_path.parent / "metrics-table.tsv").exists()
    r_est = np.asarray(results[0]["R"], dtype=float)
    t_est = np.asarray(results[0]["t"], dtype=float).flatten()
    # MSSD against GT + the extended accumulators were recorded.
    assert "mssd" in results[0]
    assert "mssd_n" in results[0]
    assert "inliers_est" in results[0] and "inliers_est_err" in results[0]
    assert "inliers_gt" in results[0] and "inliers_gt_err" in results[0]

    # Pose must be close to GT (same-renderer query/template features).
    from scipy.spatial.transform import Rotation

    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(r_est @ r_gt.T) - 1) / 2, -1, 1))
    )
    t_err = np.linalg.norm(t_est - t_gt)
    assert rot_err < 15.0, rot_err
    assert t_err < 30.0, t_err  # mm, object diameter ~80mm

    # 3b. Mixed-object inference path produces consistent results.
    mo_opts = dataclasses.replace(
        infer_opts, multi_object=True, output_dir=str(tmp_path / "inference_mo")
    )
    inf.infer_multi_object(mo_opts)
    mo_results = json.loads(
        (tmp_path / "inference_mo" / "demo" / "v1" / str(OBJ_ID) /
         "estimated-poses.json").read_text()
    )
    assert len(mo_results) == 1
    r_mo = np.asarray(mo_results[0]["R"], dtype=float)
    rot_err_mo = np.degrees(
        np.arccos(np.clip((np.trace(r_mo @ r_gt.T) - 1) / 2, -1, 1))
    )
    assert rot_err_mo < 15.0, rot_err_mo
    # Multi-object path records the retrieved-template orientation
    # accumulator and writes visualizations + gallery, exactly like the
    # single-object path (reference: utils/eval_util.py:175-188,
    # scripts/infer.py:746-802).
    assert "template_ori_err_deg" in mo_results[0]
    mo_dir = tmp_path / "inference_mo" / "demo" / "v1" / str(OBJ_ID)
    assert any((mo_dir / "vis").glob("*.png"))
    assert (mo_dir / "report.html").exists()

    # 3c. Fast-path CLI configuration: bf16 compute + bf16 banks at rest +
    # approximate top-k + fused ViT block + tanh GELU, end-to-end through the
    # real infer CLI, must recover the same pose.
    fast_opts = dataclasses.replace(
        infer_opts,
        compute_dtype="bfloat16",
        approx_topk=True,
        use_fused_block=True,
        approx_gelu=True,
        output_dir=str(tmp_path / "inference_fast"),
        vis_results=False,
    )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        inf.infer(fast_opts)
    fast_results = json.loads(
        (tmp_path / "inference_fast" / "demo" / "v1" / str(OBJ_ID) /
         "estimated-poses.json").read_text()
    )
    assert len(fast_results) == 1
    r_fast = np.asarray(fast_results[0]["R"], dtype=float)
    rot_err_fast = np.degrees(
        np.arccos(np.clip((np.trace(r_fast @ r_gt.T) - 1) / 2, -1, 1))
    )
    assert rot_err_fast < 15.0, rot_err_fast

    # 3d. Multi-host dataset sharding (parallel/host_shard.py): two shard
    # processes write shard-suffixed artifacts into ONE output dir, and the
    # submission prep merges them into the same CSV an unsharded run gives.
    for si in range(2):
        inf.infer(
            dataclasses.replace(
                infer_opts,
                vis_results=False,
                output_dir=str(tmp_path / "inference_sharded"),
                shard_index=si,
                shard_count=2,
            )
        )
    shard_dir = tmp_path / "inference_sharded" / "demo" / "v1" / str(OBJ_ID)
    shard_files = sorted(p.name for p in shard_dir.glob("estimated-poses*"))
    # The single test image lands on shard 0; shard 1 still writes its
    # (empty) file so the submission merger can verify set completeness.
    assert shard_files == [
        "estimated-poses_shard0of2.json",
        "estimated-poses_shard1of2.json",
    ]
    assert json.loads((shard_dir / "estimated-poses_shard1of2.json").read_text()) == []
    sharded_csv = bop_sub_mod.prepare(
        bop_sub_mod.PrepareBopSubmissionOpts(
            object_dataset="demo",
            version="v1",
            results_dir=str(tmp_path / "inference_sharded"),
        )
    )

    # 4. BOP submission CSV.
    sub_opts = bop_sub_mod.PrepareBopSubmissionOpts(
        object_dataset="demo",
        version="v1",
        results_dir=str(tmp_path / "inference"),
    )
    csv_path = bop_sub_mod.prepare(sub_opts)
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    assert len(lines) == 2
    assert lines[1].startswith("1,0,1,")
    # Sharded and unsharded runs flatten to identical submissions (up to the
    # wall-clock `time` column — the first run pays the jit compile).
    strip_time = lambda text: [
        l.rsplit(",", 1)[0] for l in text.strip().split("\n")
    ]
    assert strip_time(open(sharded_csv).read()) == strip_time(
        open(csv_path).read()
    )

    # 5. AR evaluation of the submission against the synthetic GT.
    from foundpose_tpu.pipeline import eval_ar as eval_ar_mod

    ar = eval_ar_mod.evaluate(
        eval_ar_mod.EvalArOpts(
            object_dataset="demo",
            submission_path=csv_path,
            bop_root=bop_root,
        )
    )
    # The recovered pose is within a few degrees/mm => most thresholds hit.
    assert ar["ar_mssd"] > 0.5
    assert ar["ar_mspd"] > 0.5
    assert 0.0 < ar["bop_ar"] <= 1.0
