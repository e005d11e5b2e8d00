import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from foundpose_tpu import geometry


def random_se3(rng):
    r = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


def test_transform_points_matches_numpy(rng):
    m = random_se3(rng)
    pts = rng.normal(size=(17, 3))
    expected = (m[:3, :3] @ pts.T).T + m[:3, 3]
    got = geometry.transform_points(jnp.asarray(m), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_transform_points_batched(rng):
    ms = np.stack([random_se3(rng) for _ in range(4)])
    pts = rng.normal(size=(4, 9, 3))
    got = geometry.transform_points(jnp.asarray(ms)[:, None], jnp.asarray(pts))
    for i in range(4):
        expected = (ms[i, :3, :3] @ pts[i].T).T + ms[i, :3, 3]
        np.testing.assert_allclose(np.asarray(got)[i], expected, atol=1e-5)


def test_inverse_se3(rng):
    m = random_se3(rng)
    inv = np.asarray(geometry.inverse_se3(jnp.asarray(m)))
    np.testing.assert_allclose(inv, np.linalg.inv(m), atol=1e-5)


def test_from_two_vectors(rng):
    for _ in range(10):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        r = np.asarray(geometry.from_two_vectors(jnp.asarray(a), jnp.asarray(b)))
        a_unit = a / np.linalg.norm(a)
        b_unit = b / np.linalg.norm(b)
        np.testing.assert_allclose(r @ a_unit, b_unit, atol=1e-5)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_rotation_about_axis(rng):
    angle = 0.7
    axis = np.array([0.0, 0.0, 1.0])
    m = np.asarray(geometry.rotation_about_axis(jnp.asarray(angle), jnp.asarray(axis)))
    expected = Rotation.from_rotvec(angle * axis).as_matrix()
    np.testing.assert_allclose(m[:3, :3], expected, atol=1e-6)


def test_rodrigues_roundtrip(rng):
    rvecs = rng.normal(size=(32, 3))
    r = np.asarray(geometry.rodrigues(jnp.asarray(rvecs)))
    expected = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(r, expected, atol=1e-5)
    back = np.asarray(geometry.rodrigues_inv(jnp.asarray(r)))
    r2 = Rotation.from_rotvec(back).as_matrix()
    np.testing.assert_allclose(r2, expected, atol=1e-4)


def test_rodrigues_small_angle():
    rvec = jnp.asarray([1e-10, 0.0, 0.0])
    r = np.asarray(geometry.rodrigues(rvec))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-8)


def test_rotation_error_deg(rng):
    r1 = Rotation.random(random_state=1).as_matrix()
    axis = np.array([1.0, 0.0, 0.0])
    r2 = r1 @ Rotation.from_rotvec(np.deg2rad(25.0) * axis).as_matrix()
    err = geometry.rotation_error_deg(jnp.asarray(r2), jnp.asarray(r1))
    np.testing.assert_allclose(float(err), 25.0, atol=1e-3)


def test_gen_look_at_matrix(rng):
    # After re-aiming, the target point must lie on the +Z optical axis.
    cam_from_world = random_se3(rng)
    target = rng.normal(size=3) + np.array([0.0, 0.0, 5.0])
    new_cam_from_world = np.asarray(
        geometry.gen_look_at_matrix(jnp.asarray(cam_from_world), jnp.asarray(target))
    )
    local = (new_cam_from_world[:3, :3] @ target) + new_cam_from_world[:3, 3]
    np.testing.assert_allclose(local[:2] / np.linalg.norm(local), 0.0, atol=1e-5)
    assert local[2] > 0
    # Camera center must be unchanged (pure rotation about the center).
    c_old = -cam_from_world[:3, :3].T @ cam_from_world[:3, 3]
    c_new = -new_cam_from_world[:3, :3].T @ new_cam_from_world[:3, 3]
    np.testing.assert_allclose(c_old, c_new, atol=1e-5)


def test_orthogonalize_rotation(rng):
    r = Rotation.random(random_state=3).as_matrix()
    noisy = r + 0.01 * rng.normal(size=(3, 3))
    fixed = np.asarray(geometry.orthogonalize_rotation(jnp.asarray(noisy)))
    np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(fixed) > 0.99


def test_inverse_3x3_matches_numpy(rng):
    ms = rng.normal(size=(50, 3, 3)) + 2 * np.eye(3)
    inv = np.asarray(geometry.inverse_3x3(jnp.asarray(ms)))
    np.testing.assert_allclose(inv, np.linalg.inv(ms), rtol=1e-4, atol=1e-5)


def test_polar_rotation_matches_svd(rng):
    for _ in range(10):
        r = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        noisy = r * 1.3 + 0.05 * rng.normal(size=(3, 3))  # scaled + perturbed
        got = np.asarray(geometry.polar_rotation(jnp.asarray(noisy)))
        exp = np.asarray(geometry.orthogonalize_rotation(jnp.asarray(noisy)))
        np.testing.assert_allclose(got, exp, atol=1e-4)
        np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-5)


def test_polar_rotation_batched(rng):
    ms = np.stack(
        [Rotation.random(random_state=i).as_matrix() * (0.5 + i * 0.1) for i in range(8)]
    )
    got = np.asarray(geometry.polar_rotation(jnp.asarray(ms)))
    for i in range(8):
        np.testing.assert_allclose(
            got[i], Rotation.random(random_state=i).as_matrix(), atol=1e-4
        )
