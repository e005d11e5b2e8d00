import os

import numpy as np

from foundpose_tpu.vis import base as vb
from foundpose_tpu.vis import html_report, inference_vis


def test_build_grid(rng):
    tiles = [rng.uniform(size=(30, 40, 3)).astype(np.float32) for _ in range(5)]
    grid = vb.build_grid(tiles, cols=3)
    assert grid.dtype == np.uint8
    assert grid.shape[0] == 2 * 30 + 2 and grid.shape[1] == 3 * 40 + 2 * 2


def test_overlay_mask_and_contour(rng):
    img = rng.uniform(size=(50, 50, 3)).astype(np.float32)
    mask = np.zeros((50, 50), np.uint8)
    mask[10:30, 10:30] = 1
    ov = vb.overlay_mask(img, mask)
    assert ov.shape == (50, 50, 3)
    # Masked area is greener than the original.
    assert ov[20, 20, 1] >= vb.to_uint8(img)[20, 20, 1]
    ct = vb.overlay_contour(img, mask, color=(255, 0, 0))
    assert (ct[10, 10:30, 0] == 255).any()


def test_draw_matches(rng):
    a = rng.uniform(size=(40, 40, 3))
    b = rng.uniform(size=(40, 40, 3))
    pts = rng.uniform(5, 35, size=(10, 2))
    out = vb.draw_matches(a, b, pts, pts, scores=np.linspace(0, 1, 10))
    assert out.shape == (40, 80, 3)


def test_feature_map_pca_rgb(rng):
    fm = rng.normal(size=(12, 12, 16)).astype(np.float32)
    rgb = inference_vis.feature_map_pca_rgb(fm)
    assert rgb.shape == (12, 12, 3) and rgb.dtype == np.uint8


def test_vis_inference_results(rng):
    crop = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    mask = (rng.uniform(size=(64, 64)) > 0.5).astype(np.uint8)
    tpl = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    pts = rng.uniform(5, 60, size=(20, 2))
    grid = inference_vis.vis_inference_results(
        crop, mask, tpl, pts, pts, np.linspace(0, 1, 20), est_mask=mask,
        feature_map=rng.normal(size=(8, 8, 12)), caption="test",
    )
    assert grid.ndim == 3 and grid.shape[2] == 3


def test_html_report(tmp_path, rng):
    imgs = [vb.to_uint8(rng.uniform(size=(20, 20, 3))) for _ in range(4)]
    records = [{"mssd": float(i)} for i in range(4)]
    path = str(tmp_path / "report.html")
    html_report.write_gallery(path, records, imgs, top_n=2)
    content = open(path).read()
    assert content.startswith("<!DOCTYPE html>")
    assert content.count("data:image/png;base64,") == 4


def test_render_pose_mask(rng):
    from foundpose_tpu.data.ply import Mesh
    from foundpose_tpu.renderer.base import RendererType, build
    from foundpose_tpu.structs import PinholeCamera

    v = np.array(
        [[-20, -20, 0], [20, -20, 0], [20, 20, 0], [-20, 20, 0]], dtype=np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(1, Mesh(vertices=v, faces=f))
    cam = PinholeCamera.create(f=(100.0, 100.0), c=(31.5, 31.5), width=64, height=64)
    mask = inference_vis.render_pose_mask(
        renderer, 1, cam, np.eye(3), np.array([0, 0, 100.0])
    )
    assert mask.sum() > 100


def test_histogram_and_scatter_primitives(rng):
    from foundpose_tpu.vis.base import draw_histogram, scatter_2d, draw_inliers

    vals = rng.normal(size=500)
    img = draw_histogram(vals, bins=16, title="errs")
    assert img.shape == (200, 320, 3) and img.dtype == np.uint8
    assert (img < 250).any()  # something was drawn

    pts = rng.uniform(size=(100, 2))
    labels = rng.integers(0, 4, size=100)
    sc = scatter_2d(pts, labels, title="tsne")
    assert sc.shape == (320, 320, 3)
    assert (sc < 250).any()

    base = np.zeros((64, 64, 3), np.uint8)
    out = draw_inliers(base, rng.uniform(0, 64, (20, 2)), rng.uniform(size=20) > 0.5)
    assert (out.sum(axis=-1) > 0).any()

    # Degenerate inputs stay well-formed.
    assert draw_histogram(np.asarray([])).shape == (200, 320, 3)
    assert scatter_2d(np.zeros((0, 2))).shape == (320, 320, 3)


def test_pointcloud_error_ply(rng, tmp_path):
    from foundpose_tpu.data.ply import load_ply
    from foundpose_tpu.vis.inference_vis import vis_pointcloud_error

    pts = rng.uniform(-30, 30, (50, 3)).astype(np.float32)
    r_gt = np.eye(3)
    t_gt = np.asarray([0.0, 0.0, 500.0])
    path = str(tmp_path / "err.ply")
    vis_pointcloud_error(pts, r_gt, t_gt + 5.0, r_gt, t_gt, path)
    mesh = load_ply(path)
    # GT (green) + estimate (blue) copies of every vertex.
    assert mesh.vertices.shape == (100, 3)
    assert mesh.colors is not None
    assert (mesh.colors[:50] == [0, 255, 0]).all()
    assert (mesh.colors[50:] == [0, 0, 255]).all()
    # The estimate copy is offset by the pose delta.
    np.testing.assert_allclose(
        mesh.vertices[50:] - mesh.vertices[:50], 5.0, atol=1e-4
    )


def test_render_pose_overlay(rng):
    """Alpha-blended posed-mesh overlay: the object region is brightened by
    the shaded render, the background dimmed
    (reference: utils/render_vis_util.py:90-180)."""
    from foundpose_tpu.renderer.base import RendererType, build
    from foundpose_tpu.vis.inference_vis import render_pose_overlay
    from test_integration import make_textured_icosahedron
    from foundpose_tpu.structs import PinholeCamera

    mesh = make_textured_icosahedron()
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(7, mesh)
    cam = PinholeCamera.create(
        f=(120.0, 120.0), c=(48.0, 48.0), width=96, height=96
    )
    base = np.full((96, 96, 3), 200, np.uint8)
    out = render_pose_overlay(
        renderer, 7, cam, np.eye(3), np.asarray([0.0, 0.0, 300.0]), base
    )
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8
    # Background dimmed to ~100; object region differs from background.
    corner = out[:4, :4].astype(int).mean()
    assert 80 < corner < 120, corner
    assert np.abs(out.astype(int) - int(corner)).max() > 40
