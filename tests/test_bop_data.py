import json

import numpy as np
import pytest
from PIL import Image

from foundpose_tpu.data import bop
from foundpose_tpu.pipeline.gen_templates import save_depth_png


@pytest.fixture
def mini_bop(tmp_path):
    ds = tmp_path / "demo" / "test" / "000002"
    (ds / "rgb").mkdir(parents=True)
    (ds / "depth").mkdir(parents=True)
    (ds / "mask_visib").mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
    Image.fromarray(img).save(ds / "rgb" / "000007.png")
    depth = np.full((480, 640), 1234.5, dtype=np.float32)
    save_depth_png(str(ds / "depth" / "000007.png"), depth)
    mask = np.zeros((480, 640), np.uint8)
    mask[100:200, 150:300] = 255
    Image.fromarray(mask).save(ds / "mask_visib" / "000007_000000.png")

    K = [500.0, 0.0, 320.0, 0.0, 500.0, 240.0, 0.0, 0.0, 1.0]
    (ds / "scene_camera.json").write_text(
        json.dumps({"7": {"cam_K": K, "depth_scale": 0.1}})
    )
    r = np.eye(3)
    (ds / "scene_gt.json").write_text(
        json.dumps(
            {"7": [{"obj_id": 3, "cam_R_m2c": r.flatten().tolist(),
                    "cam_t_m2c": [1.0, 2.0, 500.0]}]}
        )
    )
    (ds / "scene_gt_info.json").write_text(
        json.dumps({"7": [{"bbox_obj": [150, 100, 150, 100],
                           "bbox_visib": [150, 100, 150, 100],
                           "visib_fract": 0.9}]})
    )
    return str(tmp_path)


def test_prepare_sample_center_crop(mini_bop):
    sample = bop.prepare_sample(
        mini_bop, "demo", 2, 7, load_depth=True, load_masks=True,
        crop_size=(630, 476),
    )
    assert sample.image.shape == (476, 630, 3)
    # Principal point shifted by the crop offset (5, 2).
    assert sample.crop_offset == (5, 2)
    np.testing.assert_allclose(sample.K[0, 2], 320.0 - 5)
    np.testing.assert_allclose(sample.K[1, 2], 240.0 - 2)
    # BOP depth: raw PNG value (0.1mm units here) * depth_scale = mm.
    np.testing.assert_allclose(sample.depth.max(), 1234.5, atol=0.2)
    # GT parsed + boxes shifted.
    assert len(sample.gt) == 1
    g = sample.gt[0]
    assert g.obj_id == 3 and g.visib_fract == 0.9
    np.testing.assert_allclose(g.t_m2c, [1.0, 2.0, 500.0])
    np.testing.assert_allclose(g.box_amodal, [145, 98, 295, 198])
    assert g.mask_visib.shape == (476, 630)
    assert g.mask_visib.sum() == 100 * 150


def test_list_scenes_images(mini_bop):
    assert bop.list_scenes(mini_bop, "demo") == [2]
    assert bop.list_images(mini_bop, "demo", 2) == [7]


def test_symmetry_transformations_discrete():
    info = {
        "diameter": 100.0,
        "symmetries_discrete": [
            np.vstack([np.hstack([np.diag([-1.0, -1.0, 1.0]), np.zeros((3, 1))]),
                       [0, 0, 0, 1]]).flatten().tolist()
        ],
    }
    syms = bop.get_symmetry_transformations(info)
    assert len(syms) == 2
    np.testing.assert_allclose(syms[0]["R"], np.eye(3))
    np.testing.assert_allclose(syms[1]["R"], np.diag([-1.0, -1.0, 1.0]))


def test_symmetry_transformations_continuous():
    info = {
        "diameter": 100.0,
        "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}],
    }
    syms = bop.get_symmetry_transformations(info, max_sym_disc_step=0.1)
    # ceil(pi / 0.1) = 32 steps -> identity + 31 rotations.
    assert len(syms) == 32
    # All are rotations about z.
    for s in syms:
        np.testing.assert_allclose(s["R"][2, 2], 1.0, atol=1e-9)
        np.testing.assert_allclose(s["R"] @ s["R"].T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(s["t"], 0.0, atol=1e-12)
