import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import cameras, geometry
from foundpose_tpu.structs import PinholeCamera, aligned_box, box_from_mask


def make_camera(rng, width=640, height=480):
    r = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3) * 10.0
    T = np.eye(4)
    T[:3, :3] = r
    T[:3, 3] = t
    return PinholeCamera.create(
        f=(600.0, 580.0), c=(320.0, 240.0), width=width, height=height, T_world_from_eye=T
    )


def test_project_unproject_roundtrip(rng):
    cam = make_camera(rng)
    pts_eye = np.abs(rng.normal(size=(50, 3))) + np.array([0, 0, 2.0])
    win = cam.eye_to_window(jnp.asarray(pts_eye))
    rays = cam.window_to_eye(win)
    # Rays must be parallel to the original eye points.
    cos = np.sum(np.asarray(rays) * pts_eye, axis=-1) / (
        np.linalg.norm(pts_eye, axis=-1) * np.linalg.norm(np.asarray(rays), axis=-1)
    )
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_world_eye_roundtrip(rng):
    cam = make_camera(rng)
    pts = rng.normal(size=(20, 3))
    eye = cam.world_to_eye(jnp.asarray(pts))
    back = cam.eye_to_world(eye)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_intrinsic_matrix(rng):
    cam = make_camera(rng)
    k = np.asarray(cam.K)
    assert k[0, 0] == 600.0 and k[1, 1] == 580.0
    assert k[0, 2] == 320.0 and k[1, 2] == 240.0
    cam2 = PinholeCamera.from_intrinsic_matrix(k, 640, 480)
    np.testing.assert_allclose(np.asarray(cam2.K), k)


def test_calc_crop_box():
    box = aligned_box(10.0, 20.0, 50.0, 40.0)
    out = np.asarray(cameras.calc_crop_box(box, make_square=True))
    # 40x20 box -> square 40x40 centered at same point.
    np.testing.assert_allclose(out, [10.0, 10.0, 50.0, 50.0])


def test_construct_crop_camera_centers_box(rng):
    cam = make_camera(rng)
    box = aligned_box(200.0, 150.0, 400.0, 330.0)
    crop_cam = cameras.construct_crop_camera(
        box=box, camera_c2w=cam, viewport_size=(420, 420), viewport_rel_pad=0.2
    )
    assert crop_cam.width == 420 and crop_cam.height == 420
    # Camera center is preserved, orientation is re-aimed.
    np.testing.assert_allclose(
        np.asarray(crop_cam.T_world_from_eye)[:3, 3],
        np.asarray(cam.T_world_from_eye)[:3, 3],
        atol=1e-4,
    )
    # The box-corner rays' centroid must project to the viewport center.
    f = 0.5 * (float(cam.f[0]) + float(cam.f[1]))
    corners = np.array(
        [
            [200.0 - 320.0, 150.0 - 240.0, f],
            [400.0 - 320.0, 150.0 - 240.0, f],
            [200.0 - 320.0, 330.0 - 240.0, f],
            [400.0 - 320.0, 330.0 - 240.0, f],
        ]
    )
    corners /= np.linalg.norm(corners, axis=1, keepdims=True)
    centroid_eye = corners.mean(axis=0)
    centroid_w = np.asarray(cam.eye_to_world(jnp.asarray(centroid_eye)))
    uv = np.asarray(crop_cam.world_to_window(jnp.asarray(centroid_w)))
    np.testing.assert_allclose(uv, [209.5, 209.5], atol=1e-3)
    # All corner rays (with padding) must project inside the viewport.
    corners_w = np.asarray(cam.eye_to_world(jnp.asarray(corners)))
    uvs = np.asarray(crop_cam.world_to_window(jnp.asarray(corners_w)))
    assert (uvs > 0).all() and (uvs < 420).all()


def test_fibonacci_sphere_radius():
    pts = cameras.fibonacci_sphere(57, radius=2.5)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 2.5, atol=1e-6)
    assert pts.shape == (57, 3)


def test_sample_views_look_at_origin():
    views = cameras.sample_views(57, radius=3.0)
    assert len(views) == 57
    for v in views[:5]:
        # Origin must project onto the optical axis at distance `radius`.
        origin_in_cam = v["t"].flatten()
        np.testing.assert_allclose(origin_in_cam[:2], 0.0, atol=1e-9)
        np.testing.assert_allclose(origin_in_cam[2], 3.0, atol=1e-9)
        np.testing.assert_allclose(v["R"] @ v["R"].T, np.eye(3), atol=1e-9)


def test_inplane_rotations():
    views = cameras.sample_views(9, radius=1.0)
    rotated = cameras.inplane_rotated_views(views, 14)
    assert len(rotated) == len(views) * 14
    # In-plane rotation keeps the origin on the optical axis.
    for v in rotated[:20]:
        np.testing.assert_allclose(v["t"].flatten()[:2], 0.0, atol=1e-9)


def test_box_from_mask():
    mask = np.zeros((20, 30), dtype=np.uint8)
    mask[5:10, 8:15] = 1
    box = np.asarray(box_from_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(box, [8.0, 5.0, 14.0, 9.0])
    empty = np.asarray(box_from_mask(jnp.zeros((4, 4))))
    np.testing.assert_allclose(empty, 0.0)


def test_build_crop_cameras_matches_per_box_loop():
    """The batched crop-camera builder must agree exactly with the
    per-detection construct_crop_camera loop it replaces (the loop's eager
    op count scales with N; the batched call's does not)."""
    import jax

    from foundpose_tpu import cameras as cam_mod
    from foundpose_tpu.structs import PinholeCamera

    K = np.array([[600.0, 0, 320.0], [0, 580.0, 240.0], [0, 0, 1.0]])
    cam = PinholeCamera.from_intrinsic_matrix(K, width=640, height=480)
    boxes = jnp.asarray(
        [
            [40.0, 60.0, 180.0, 150.0],
            [300.0, 100.0, 420.0, 310.0],
            [10.0, 10.0, 630.0, 470.0],
            [500.5, 399.25, 560.75, 440.0],
        ],
        dtype=jnp.float32,
    )
    batched = cam_mod.build_crop_cameras(
        cam, boxes, viewport_size=(420, 420), viewport_rel_pad=0.2
    )
    for i in range(boxes.shape[0]):
        single = cam_mod.construct_crop_camera(
            box=cam_mod.calc_crop_box(boxes[i], make_square=True),
            camera_c2w=cam,
            viewport_size=(420, 420),
            viewport_rel_pad=0.2,
        )
        got = jax.tree.map(lambda a: np.asarray(a)[i], batched)
        np.testing.assert_allclose(np.asarray(got.f), np.asarray(single.f),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got.c), np.asarray(single.c),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got.T_world_from_eye),
            np.asarray(single.T_world_from_eye), atol=1e-6,
        )
    assert batched.width == 420 and batched.height == 420
