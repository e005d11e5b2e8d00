import dataclasses
import json
from typing import List, Optional, Tuple

import numpy as np
import pytest

from foundpose_tpu.data import detections as det_mod
from foundpose_tpu.utils import config as cfg_mod


@dataclasses.dataclass(frozen=True)
class DemoOpts:
    version: str
    object_lids: Optional[List[int]] = None
    crop_size: Tuple[int, int] = (420, 420)
    use_detections: bool = True
    crop_rel_pad: float = 0.2


def test_camel_to_snake():
    assert cfg_mod.camel_to_snake("GenTemplatesOpts") == "gen_templates_opts"
    assert cfg_mod.camel_to_snake("InferOpts") == "infer_opts"


def test_load_opts_from_json(tmp_path):
    p = tmp_path / "opts.json"
    p.write_text(
        json.dumps(
            {
                "demo_opts": {
                    "version": "v1",
                    "object_lids": [1, 5],
                    "crop_size": [630, 476],
                    "use_detections": False,
                }
            }
        )
    )
    opts = cfg_mod.load_opts(DemoOpts, ["--opts-path", str(p)])
    assert opts.version == "v1"
    assert opts.object_lids == [1, 5]
    assert opts.crop_size == (630, 476)
    assert opts.use_detections is False
    assert opts.crop_rel_pad == 0.2


def test_load_opts_from_cli():
    opts = cfg_mod.load_opts(
        DemoOpts,
        ["--version", "v2", "--object-lids", "3", "7", "--crop-rel-pad", "0.5",
         "--use-detections", "false"],
    )
    assert opts.version == "v2"
    assert opts.object_lids == [3, 7]
    assert opts.crop_rel_pad == 0.5
    assert opts.use_detections is False


def test_load_opts_rejects_unknown_keys(tmp_path):
    p = tmp_path / "opts.json"
    p.write_text(json.dumps({"demo_opts": {"version": "v1", "bogus": 1}}))
    with pytest.raises(ValueError, match="bogus"):
        cfg_mod.load_opts(DemoOpts, ["--opts-path", str(p)])


def test_load_opts_missing_required(tmp_path):
    p = tmp_path / "opts.json"
    p.write_text(json.dumps({"demo_opts": {}}))
    with pytest.raises(ValueError, match="version"):
        cfg_mod.load_opts(DemoOpts, ["--opts-path", str(p)])


def test_save_opts_roundtrip(tmp_path):
    opts = DemoOpts(version="v3", object_lids=[2])
    path = str(tmp_path / "snap.json")
    cfg_mod.save_opts(opts, path)
    back = cfg_mod.load_opts(DemoOpts, ["--opts-path", path])
    assert back == opts


# ---------------------------------------------------------------------------
# Detections
# ---------------------------------------------------------------------------


def test_rle_roundtrip():
    mask = np.zeros((5, 7), dtype=bool)
    mask[1:4, 2:5] = True
    # Build uncompressed RLE (column-major) manually.
    flat = mask.T.flatten()
    counts = []
    run_val = False
    run = 0
    for v in flat:
        if v == run_val:
            run += 1
        else:
            counts.append(run)
            run_val = v
            run = 1
    counts.append(run)
    rle = {"counts": counts, "size": [5, 7]}
    back = det_mod.rle_to_mask(rle)
    np.testing.assert_array_equal(back, mask)


def test_instances_for_pose_estimation():
    dets = [
        {"scene_id": 1, "image_id": 2, "category_id": 5, "score": 0.9,
         "bbox": [10, 20, 30, 40], "time": 0.3},
        {"scene_id": 1, "image_id": 2, "category_id": 5, "score": 0.5,
         "bbox": [5, 5, 10, 10]},
        {"scene_id": 1, "image_id": 2, "category_id": 5, "score": 0.7,
         "bbox": [0, 0, 8, 8]},
    ]
    out = det_mod.instances_for_pose_estimation(dets, max_num_preds=2,
                                                crop_offset=(5, 2))
    assert len(out) == 2
    assert out[0].score == 0.9 and out[1].score == 0.7
    np.testing.assert_allclose(out[0].box_xyxy, [5, 18, 35, 58])


def test_associate_gt_by_iou():
    det_box = np.array([0, 0, 10, 10], dtype=np.float32)
    gts = [np.array([20, 20, 30, 30]), np.array([1, 1, 11, 11]), None]
    assert det_mod.associate_gt_by_iou(det_box, gts) == 1
    assert det_mod.associate_gt_by_iou(det_box, [np.array([50, 50, 60, 60])]) == -1


def test_reference_infer_config_loads():
    """The reference's published configs/infer/lmo.json fields all load."""
    from foundpose_tpu.pipeline.infer import InferOpts

    ref_cfg = {
        "version": "v1", "object_dataset": "lmo", "repre_version": "v1",
        "crop_rel_pad": 0.2, "crop_size": [420, 420], "use_detections": True,
        "extractor_name":
            "dinov2_version=vits14-reg_stride=14_facet=token_layer=9_logbin=0_norm=1",
        "grid_cell_size": 14.0, "match_template_type": "tfidf",
        "match_top_n_templates": 5, "match_feat_matching_type": "cyclic_buddies",
        "match_top_k_buddies": 300, "pnp_type": "opencv", "pnp_ransac_iter": 400,
        "pnp_inlier_thresh": 10.0, "final_pose_type": "best_coarse",
        "num_preds_factor": 1, "vis_results": True,
    }
    opts = cfg_mod.from_dict(InferOpts, ref_cfg)
    assert opts.match_top_k_buddies == 300
    assert opts.crop_size == (420, 420)


def test_shipped_configs_load():
    """Every shipped configs/*.json must validate against its opts class."""
    import glob
    import os

    from foundpose_tpu.pipeline.gen_repre import GenRepreOpts
    from foundpose_tpu.pipeline.gen_templates import GenTemplatesOpts
    from foundpose_tpu.pipeline.infer import InferOpts

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    classes = {
        "infer": InferOpts,
        "gen_repre": GenRepreOpts,
        "gen_templates": GenTemplatesOpts,
    }
    count = 0
    for sub, cls in classes.items():
        for path in glob.glob(os.path.join(root, sub, "*.json")):
            opts = cfg_mod.load_opts(cls, ["--opts-path", path])
            assert opts.object_dataset in ("lmo", "tudl", "ycbv", "tless")
            count += 1
    # 4 datasets x 3 stages + infer/{lmo_exact,lmo_refine,lmo_vitl}.json
    assert count == 15


def test_shipped_infer_configs_engage_fast_path():
    """The shipped configs/infer/*.json must resolve to the BENCHED fast
    path — fused-block Pallas ViT admitted by the VMEM guard at the
    production token count, capped softmax stabilizer, bf16 compute, approx
    top-k — so a user following the quickstart runs the configuration the
    README headline measures (validated AR-neutral by
    benchmarks/cross_parity.py). lmo_exact.json stays on the exact-f32
    path for numerical parity runs."""
    import glob
    import os

    import jax.numpy as jnp

    from foundpose_tpu.models import dinov2
    from foundpose_tpu.ops.vit_block import choose_mlp_chunks
    from foundpose_tpu.pipeline.infer import InferOpts

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "infer")
    fast_paths = sorted(
        p for p in glob.glob(os.path.join(root, "*.json"))
        if not p.endswith("_exact.json")
    )
    # 4 datasets + lmo_refine.json + lmo_vitl.json — every non-exact
    # config must engage the benched fast path (incl. ViT-L's fused block
    # under the VMEM guard).
    assert len(fast_paths) == 6
    for path in fast_paths:
        opts = cfg_mod.load_opts(InferOpts, ["--opts-path", path])
        assert opts.use_pallas_attention and opts.use_fused_block
        assert opts.approx_gelu and opts.approx_topk
        assert opts.compute_dtype == "bfloat16"
        # AR-gated solve budget (benchmarks/ransac_sweep.py: 200x2-LO is
        # AR-identical to 400x2-LO on 2 seeds x 200 crops).
        assert opts.pnp_ransac_iter == 200 and opts.pnp_lo_iters == 2
        vit_cfg = dinov2.resolve_config(
            opts.extractor_name,
            use_pallas_attention=opts.use_pallas_attention,
            use_fused_block=opts.use_fused_block,
            approx_gelu=opts.approx_gelu,
            overrides=opts.vit_overrides,
        )
        assert vit_cfg.use_fused_block
        assert vit_cfg.softmax_stabilizer == "capped"
        # The VMEM guard must ADMIT the fused kernel at the production
        # shape: (420/14)^2 + cls + 4 registers = 905 tokens -> 912 padded
        # (the same chunk chooser models/dinov2._run_blocks consults).
        grid = opts.crop_size[0] // vit_cfg.patch_size
        t = grid * grid + 1 + vit_cfg.num_register_tokens
        t_pad = -(-t // 16) * 16
        chunks = choose_mlp_chunks(
            t_pad, vit_cfg.embed_dim, vit_cfg.mlp_hidden,
            jnp.dtype(jnp.bfloat16).itemsize, vit_cfg.swiglu,
            images_per_step=vit_cfg.fused_images_per_step,
            paired_heads=vit_cfg.fused_paired_heads,
        )
        assert chunks is not None, f"VMEM guard rejects the fused path: {path}"

    exact = cfg_mod.load_opts(
        InferOpts, ["--opts-path", os.path.join(root, "lmo_exact.json")]
    )
    assert not exact.use_fused_block and not exact.approx_gelu
    assert exact.compute_dtype == "float32" and not exact.approx_topk
    assert exact.pnp_ransac_iter == 400  # strict reference budget
    assert exact.vit_overrides is None


def test_merge_json_helpers():
    """Recursive merge + dotted-path merge
    (reference: utils/json_util.py:39-97)."""
    from foundpose_tpu.utils.config import merge_json, merge_json_at_path

    base = {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": "keep"}
    upd = {"a": {"y": 20, "z": 30}, "b": [9]}
    out = merge_json(base, upd)
    assert out == {"a": {"x": 1, "y": 20, "z": 30}, "b": [9], "c": "keep"}
    assert base["a"] == {"x": 1, "y": 2}  # inputs untouched

    out2 = merge_json_at_path(base, "a.y", 99)
    assert out2["a"] == {"x": 1, "y": 99}
    out3 = merge_json_at_path({}, "p.q.r", {"v": 1})
    assert out3 == {"p": {"q": {"r": {"v": 1}}}}


def test_load_opts_layering_and_set(tmp_path):
    """--opts-extra deep-merges envelope files; --set patches dotted fields."""
    import dataclasses as dc
    import json

    from foundpose_tpu.utils.config import load_opts

    @dc.dataclass(frozen=True)
    class DemoOpts:
        name: str = "x"
        batch_size: int = 4
        crop_size: tuple = (420, 420)

    base = tmp_path / "base.json"
    base.write_text(json.dumps({"demo_opts": {"name": "base", "batch_size": 8}}))
    extra = tmp_path / "extra.json"
    extra.write_text(json.dumps({"demo_opts": {"batch_size": 16}}))

    opts = load_opts(DemoOpts, argv=["--opts-path", str(base)])
    assert opts.name == "base" and opts.batch_size == 8

    opts = load_opts(
        DemoOpts, argv=["--opts-path", str(base), "--opts-extra", str(extra)]
    )
    assert opts.batch_size == 16 and opts.name == "base"

    opts = load_opts(
        DemoOpts,
        argv=[
            "--opts-path", str(base),
            "--opts-extra", str(extra),
            "--set", "batch_size=32",
            "--set", 'name="patched"',
        ],
    )
    assert opts.batch_size == 32 and opts.name == "patched"


def test_load_opts_set_without_opts_path(tmp_path):
    """--set / --opts-extra apply in the flag-only branch too."""
    import dataclasses as dc
    import json

    from foundpose_tpu.utils.config import load_opts

    @dc.dataclass(frozen=True)
    class Demo2Opts:
        name: str = "x"
        batch_size: int = 4

    opts = load_opts(Demo2Opts, argv=["--set", "batch_size=32"])
    assert opts.batch_size == 32

    extra = tmp_path / "extra.json"
    extra.write_text(json.dumps({"demo2_opts": {"name": "layered"}}))
    opts = load_opts(
        Demo2Opts,
        argv=["--opts-extra", str(extra), "--batch-size", "9"],
    )
    assert opts.name == "layered" and opts.batch_size == 9
    # --set wins over explicit flags (it is the most explicit override).
    opts = load_opts(
        Demo2Opts, argv=["--batch-size", "9", "--set", "batch_size=11"]
    )
    assert opts.batch_size == 11


def test_yaml_twin_of_lmo_config_loads_identically(tmp_path):
    """A .yaml twin of configs/infer/lmo.json resolves to the identical
    options (reference accepts both formats: utils/config_util.py:88-109)."""
    import os

    import yaml

    from foundpose_tpu.pipeline.infer import InferOpts

    json_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "infer", "lmo.json"
    )
    with open(json_path) as f:
        envelope = json.load(f)
    yaml_path = tmp_path / "lmo.yaml"
    with open(yaml_path, "w") as f:
        yaml.safe_dump(envelope, f)

    from_json = cfg_mod.load_opts(InferOpts, ["--opts-path", json_path])
    from_yaml = cfg_mod.load_opts(InferOpts, ["--opts-path", str(yaml_path)])
    assert from_json == from_yaml

    # --opts-extra accepts yaml too, and unknown extensions are rejected.
    patched = cfg_mod.load_opts(
        InferOpts,
        ["--opts-path", json_path, "--opts-extra", str(yaml_path)],
    )
    assert patched == from_json
    with pytest.raises(ValueError, match="json or a .yaml|.json or .yaml"):
        cfg_mod.load_envelope_file(str(tmp_path / "lmo.toml"))


def test_reference_gen_stage_configs_load():
    """The reference's published gen_templates/gen_repre lmo.json envelopes
    load unchanged — including the NESTED template_desc_opts block
    (reference utils/repre_util.py:24-31, overriding the flat tfidf_*
    fields) and the schema-only renderer options the reference declares
    but never consumes (scripts/gen_templates.py:46-51)."""
    from foundpose_tpu.pipeline.gen_repre import GenRepreOpts
    from foundpose_tpu.pipeline.gen_templates import GenTemplatesOpts

    gr = cfg_mod.from_dict(GenRepreOpts, {
        "version": "v1", "templates_version": "v1", "object_dataset": "lmo",
        "object_lids": [1, 5, 6, 8, 9, 10, 11, 12],
        "extractor_name": (
            "dinov2_version=vits14-reg_stride=14_facet=token"
            "_layer=9_logbin=0_norm=1"
        ),
        "grid_cell_size": 14.0, "apply_pca": True, "pca_components": 256,
        "cluster_features": True, "cluster_num": 2048,
        "template_desc_opts": {"desc_type": "tfidf", "tfidf_knn_k": 5},
    })
    assert gr.template_desc_opts.tfidf_knn_k == 5
    with pytest.raises(ValueError, match="Unknown template descriptor"):
        # Same contract as reference scripts/gen_repre.py:343 — checked at
        # the point of use; exercise it via the tfidf resolution.
        from foundpose_tpu.pipeline import gen_repre as gr_mod

        bad = dataclasses.replace(
            gr, template_desc_opts=gr_mod.TemplateDescOpts(desc_type="bow")
        )
        gr_mod.generate_repre(bad, metadata=[])

    gt = cfg_mod.from_dict(GenTemplatesOpts, {
        "version": "v1", "object_dataset": "lmo",
        "object_lids": [1, 5, 6, 8, 9, 10, 11, 12],
        "num_viewspheres": 1, "min_num_viewpoints": 57,
        "num_inplane_rotations": 14, "images_per_view": 1,
        "max_num_triangles": 20000, "back_face_culling": False,
        "texture_size": [1024, 1024], "ssaa_factor": 4.0,
        "background_type": "black", "light_type": "multi_directional",
        "features_patch_size": 14, "crop": True, "crop_rel_pad": 0.2,
        "crop_size": [420, 420],
    })
    assert gt.images_per_view == 1 and gt.texture_size == (1024, 1024)
