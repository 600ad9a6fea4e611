import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loopy_slam_tpu.ops import camera


def random_rot(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_quat_rot_round_trip(rng):
    for _ in range(20):
        R = random_rot(rng)
        q = camera.rot_to_quat(R)
        R2 = np.asarray(camera.quat_to_rot(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_to_rot_scale_invariant(rng):
    q = rng.normal(size=4)
    R1 = np.asarray(camera.quat_to_rot(jnp.asarray(q)))
    R2 = np.asarray(camera.quat_to_rot(jnp.asarray(3.7 * q)))
    np.testing.assert_allclose(R1, R2, atol=1e-5)
    np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-5)


def test_c2w_tensor_round_trip(rng):
    R = random_rot(rng)
    t = rng.normal(size=3)
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = t
    t7 = camera.tensor_from_c2w(c2w)
    back = np.asarray(camera.c2w_from_tensor(jnp.asarray(t7)))
    np.testing.assert_allclose(back, c2w[:3], atol=1e-5)


def test_rays_shape_and_convention():
    c2w = jnp.eye(4)
    rays_o, rays_d = camera.get_rays(4, 6, 10.0, 10.0, 2.5, 1.5, c2w)
    assert rays_o.shape == (4, 6, 3) and rays_d.shape == (4, 6, 3)
    # identity pose: direction z is -1, x grows with column index
    np.testing.assert_allclose(np.asarray(rays_d[..., 2]), -1.0)
    d = np.asarray(rays_d)
    assert d[0, 0, 0] < d[0, 5, 0]
    assert d[0, 0, 1] > d[3, 0, 1]  # y flipped with row


def test_project_points_inverts_rays(rng):
    fx = fy = 50.0
    cx, cy = 20.0, 15.0
    R = random_rot(rng)
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = rng.normal(size=3)
    i = jnp.asarray([3.0, 17.5, 30.0])
    j = jnp.asarray([4.0, 11.0, 28.0])
    rays_o, rays_d = camera.rays_from_uv(i, j, jnp.asarray(c2w), fx, fy, cx, cy)
    depth = jnp.asarray([1.0, 2.0, 3.0])
    pts = rays_o + rays_d * depth[:, None]
    w2c = np.asarray(camera.invert_c2w(jnp.asarray(c2w)))
    uv, z = camera.project_points(pts, jnp.asarray(w2c), fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(i), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(j), atol=1e-3)
    np.testing.assert_allclose(np.asarray(-z), np.asarray(depth), atol=1e-4)


def test_horn_align_recovers_transform(rng):
    pts = rng.normal(size=(3, 50))
    R = random_rot(rng)
    t = rng.normal(size=(3, 1))
    data = R @ pts + t
    rot, trans, err = camera.horn_align(pts, data)
    np.testing.assert_allclose(rot, R, atol=1e-8)
    np.testing.assert_allclose(trans, t, atol=1e-8)
    assert err.max() < 1e-8
