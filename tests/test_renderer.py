import os

import numpy as np
import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from foundpose_tpu.data.ply import Mesh, load_ply, save_ply
from foundpose_tpu.renderer import rasterizer as rast
from foundpose_tpu.renderer.base import RendererType, RenderType, build
from foundpose_tpu.structs import PinholeCamera


def make_quad(z=100.0, half=20.0):
    """Two triangles forming a square facing the camera at depth z (mm)."""
    v = np.array(
        [
            [-half, -half, z],
            [half, -half, z],
            [half, half, z],
            [-half, half, z],
        ],
        dtype=np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return v, f


def test_rasterize_quad_depth_and_mask():
    v, f = make_quad(z=100.0, half=20.0)
    color, depth, mask = rast.rasterize(
        v, f, None, None, np.array([100.0, 100.0]), np.array([31.5, 31.5]),
        64, 64, shading=0,
    )
    # Square of side 40mm at z=100 with f=100 -> 40px wide, centered.
    assert mask.sum() > 35 * 35
    assert mask.sum() < 45 * 45
    np.testing.assert_allclose(depth[mask > 0], 100.0, atol=1e-3)
    assert mask[31, 31] == 1
    assert mask[2, 2] == 0
    # Unlit grey color.
    np.testing.assert_allclose(color[31, 31], 0.5, atol=1e-5)


def test_rasterize_zbuffer_occlusion():
    v1, f1 = make_quad(z=100.0, half=20.0)
    v2, f2 = make_quad(z=50.0, half=5.0)  # closer, smaller
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    colors = np.concatenate(
        [np.tile([1.0, 0.0, 0.0], (4, 1)), np.tile([0.0, 1.0, 0.0], (4, 1))]
    ).astype(np.float32)
    color, depth, mask = rast.rasterize(
        v, f, colors, None, np.array([100.0, 100.0]), np.array([31.5, 31.5]),
        64, 64, shading=0,
    )
    # Center pixel shows the closer (green) quad at depth 50.
    np.testing.assert_allclose(depth[31, 31], 50.0, atol=1e-3)
    np.testing.assert_allclose(color[31, 31], [0.0, 1.0, 0.0], atol=1e-5)
    # Off-center (but inside big quad): the far red quad.
    np.testing.assert_allclose(depth[31, 50], 100.0, atol=1e-3)
    np.testing.assert_allclose(color[31, 50], [1.0, 0.0, 0.0], atol=1e-5)


def test_native_matches_numpy_fallback(rng):
    if rast._get_native() is None:
        pytest.skip("native rasterizer not built")
    # Random blob of triangles in front of the camera.
    v = rng.uniform(-30, 30, size=(30, 3)).astype(np.float32)
    v[:, 2] += 120.0
    f = rng.integers(0, 30, size=(40, 3)).astype(np.int32)
    colors = rng.uniform(size=(30, 3)).astype(np.float32)
    args = (
        v, f, colors, None, np.array([80.0, 80.0]), np.array([31.5, 31.5]), 64, 64,
    )
    c1, d1, m1 = rast.rasterize(*args, shading=1)
    native = rast._NATIVE
    try:
        rast._NATIVE = None
        c2, d2, m2 = rast.rasterize(*args, shading=1)
    finally:
        rast._NATIVE = native
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(d1, d2, atol=1e-2)
    np.testing.assert_allclose(c1, c2, atol=1e-2)


def test_renderer_interface_world_pose():
    """Mesh at origin, camera looking from +z distance via c2w extrinsics."""
    v, f = make_quad(z=0.0, half=20.0)  # quad in model space at z=0
    mesh = Mesh(vertices=v, faces=f)
    renderer = build(RendererType.SOFTWARE_RASTERIZER)
    renderer.add_object_model(7, mesh)
    # Camera at world z=-100 looking down +z: c2w = translation(0,0,-100).
    t_c2w = np.eye(4)
    t_c2w[2, 3] = -100.0
    cam = PinholeCamera.create(
        f=(100.0, 100.0), c=(31.5, 31.5), width=64, height=64, T_world_from_eye=t_c2w
    )
    out = renderer.render_object_model(7, cam)
    assert out[RenderType.MASK].sum() > 0
    np.testing.assert_allclose(
        out[RenderType.DEPTH][out[RenderType.MASK] > 0], 100.0, atol=1e-3
    )


def test_ply_roundtrip(tmp_path, rng):
    v = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    f = rng.integers(0, 10, size=(6, 3)).astype(np.int32)
    colors = rng.integers(0, 255, size=(10, 3)).astype(np.uint8)
    mesh = Mesh(vertices=v, faces=f, colors=colors)
    path = str(tmp_path / "mesh.ply")
    save_ply(path, mesh)
    back = load_ply(path)
    np.testing.assert_allclose(back.vertices, v, atol=1e-4)
    np.testing.assert_array_equal(back.faces, f)
    np.testing.assert_array_equal(back.colors, colors)


def test_native_rasterizer_autobuilds(tmp_path):
    """The ctypes loader must build librasterizer.so itself on first use when
    a compiler exists — a silent numpy fallback costs 22x per SSAA template
    render and once burned a full builder run (1932 vs 87 ms per 1680^2
    frame). The build is lazy (first _get_native call, not import) and
    flock-serialized against concurrent processes."""
    import shutil
    import subprocess
    import sys

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no compiler on this host")
    # Run in a subprocess so we exercise the cold path with the library
    # removed, without disturbing this process's loaded handle.
    code = (
        "import os, sys; sys.path.insert(0, %r)\n"
        "so = os.path.join(%r, 'native', 'librasterizer.so')\n"
        "if os.path.exists(so): os.remove(so)\n"
        "from foundpose_tpu.renderer import rasterizer as rz\n"
        "assert rz._NATIVE is None, 'import must not eagerly build'\n"
        "assert rz._get_native() is not None, 'auto-build failed'\n"
        "print('native ok')\n"
    ) % (_REPO, _REPO)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
    )
    assert "native ok" in out.stdout, out.stderr


def test_camera_from_json_numpy_leaves_and_3x4():
    """camera_from_json must return numpy-leaf pytrees (eager jnp here costs
    a device round trip per template on tunneled backends) and accept a 3x4
    world-from-camera matrix."""
    from foundpose_tpu.pipeline.gen_templates import camera_from_json

    t34 = np.eye(4)[:3].tolist()
    cam = camera_from_json(
        {
            "fx": 600.0, "fy": 601.0, "cx": 209.5, "cy": 210.5,
            "ImageSizeX": 420, "ImageSizeY": 420,
            "T_WorldFromCamera": t34,
        }
    )
    assert isinstance(cam.f, np.ndarray) and isinstance(
        cam.T_world_from_eye, np.ndarray
    )
    assert cam.T_world_from_eye.shape == (4, 4)
    np.testing.assert_allclose(cam.T_world_from_eye[3], [0, 0, 0, 1])
    np.testing.assert_allclose(cam.f, [600.0, 601.0])
