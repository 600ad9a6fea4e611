"""Camera geometry: quaternion poses, ray generation, alignment.

Functional JAX equivalents of the reference's camera math
(reference src/common.py:104-120,301-379,425-442), with the same
conventions: c2w uses the OpenGL-style axis flip (ray dirs
[(i-cx)/fx, -(j-cy)/fy, -1]), poses are parametrized as a 7-vector
[qw qx qy qz tx ty tz] with an *unnormalized* quaternion (normalization
happens inside quat_to_rot), which keeps pose optimization unconstrained.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion(s) [..., 4] (w,x,y,z) -> rotation [..., 3, 3].

    Differentiable; matches reference quad2rotation (src/common.py:301-324):
    scale 2/(q.q) makes the map invariant to quaternion magnitude.
    """
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    r = jnp.stack(
        [
            1 - two_s * (qj**2 + qk**2),
            two_s * (qi * qj - qk * qr),
            two_s * (qi * qk + qj * qr),
            two_s * (qi * qj + qk * qr),
            1 - two_s * (qi**2 + qk**2),
            two_s * (qj * qk - qi * qr),
            two_s * (qi * qk - qj * qr),
            two_s * (qj * qk + qi * qr),
            1 - two_s * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix (3,3) -> unit quaternion (w,x,y,z). Host-side (numpy).

    Shepperd's method (numerically stable branch selection); replaces the
    reference's scipy round-trip (src/common.py:354-379).
    """
    R = np.asarray(R, dtype=np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def c2w_from_tensor(t7: jnp.ndarray) -> jnp.ndarray:
    """Pose 7-vector [quat(4), trans(3)] -> 3x4 c2w (differentiable).

    Matches reference get_camera_from_tensor (src/common.py:327-343).
    Accepts [..., 7].
    """
    R = quat_to_rot(t7[..., :4])
    T = t7[..., 4:]
    return jnp.concatenate([R, T[..., :, None]], axis=-1)


def tensor_from_c2w(c2w: np.ndarray) -> np.ndarray:
    """4x4 (or 3x4) c2w -> pose 7-vector [quat, trans]. Host-side.

    Matches reference get_tensor_from_camera (src/common.py:354-379).
    """
    c2w = np.asarray(c2w)
    q = rot_to_quat(c2w[:3, :3])
    return np.concatenate([q, c2w[:3, 3]], axis=0).astype(np.float32)


def c2w_to_4x4(c2w34: jnp.ndarray) -> jnp.ndarray:
    """Append the homogeneous bottom row to a 3x4 pose."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=c2w34.dtype)
    return jnp.concatenate([c2w34, bottom], axis=0)


def np_c2w_from_tensor(t7: np.ndarray) -> np.ndarray:
    """Pose 7-vector -> 4x4 c2w, pure numpy (host path: converting device
    arrays eagerly costs ~10 multi-ms dispatches on remote runtimes)."""
    q = np.asarray(t7[:4], np.float64)
    qr, qi, qj, qk = q
    s = 2.0 / np.dot(q, q)
    R = np.array([
        [1 - s * (qj**2 + qk**2), s * (qi*qj - qk*qr), s * (qi*qk + qj*qr)],
        [s * (qi*qj + qk*qr), 1 - s * (qi**2 + qk**2), s * (qj*qk - qi*qr)],
        [s * (qi*qk - qj*qr), s * (qj*qk + qi*qr), 1 - s * (qi**2 + qj**2)],
    ])
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R
    out[:3, 3] = t7[4:]
    return out


def rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """Pixel coords (i=col, j=row, float) + c2w -> (rays_o, rays_d).

    Same convention as reference get_rays_from_uv (src/common.py:104-120):
    dirs = [(i-cx)/fx, -(j-cy)/fy, -1] rotated into world frame.
    c2w may be 3x4 or 4x4.
    """
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )
    # highest precision: TPU default matmul runs bf16 passes, which is far
    # too coarse for camera geometry (px-level errors)
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision="highest")
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(H, W, fx, fy, cx, cy, c2w):
    """Rays for a full image, row-major (H, W, 3).

    Matches reference get_rays (src/common.py:425-442).
    """
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def project_points(points, w2c, fx, fy, cx, cy):
    """World points (N,3) -> pixel uv (N,2) and camera-frame z (N,).

    Implements the reference's projection used in frustum masking
    (src/Mapper.py:137-217): camera coords get x *= -1 before applying K,
    and depth along the optical axis is -z (camera looks down -z).
    """
    R, t = w2c[:3, :3], w2c[:3, 3]
    cam = jnp.matmul(points, R.T, precision="highest") + t
    cam = cam * jnp.array([-1.0, 1.0, 1.0], dtype=cam.dtype)
    z = cam[:, 2]
    u = fx * cam[:, 0] / (z + 1e-10) + cx
    v = fy * cam[:, 1] / (z + 1e-10) + cy
    return jnp.stack([u, v], axis=-1), z


def invert_c2w(c2w: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 (or 3x4) transform analytically."""
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    Rinv = R.T
    tinv = -Rinv @ t
    top = jnp.concatenate([Rinv, tinv[:, None]], axis=1)
    return c2w_to_4x4(top)


def horn_align(model: np.ndarray, data: np.ndarray):
    """Horn closed-form SE(3) alignment of two (3,N) trajectories.

    Host-side; same algorithm as reference eval_ate align (src/tools/
    eval_ate.py:45). Returns (rot, trans, trans_error per point).
    """
    model = np.asarray(model, dtype=np.float64)
    data = np.asarray(data, dtype=np.float64)
    model_zerocentered = model - model.mean(1, keepdims=True)
    data_zerocentered = data - data.mean(1, keepdims=True)
    W = np.zeros((3, 3))
    for column in range(model.shape[1]):
        W += np.outer(model_zerocentered[:, column], data_zerocentered[:, column])
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    model_aligned = rot @ model + trans
    alignment_error = model_aligned - data
    trans_error = np.sqrt(np.sum(alignment_error * alignment_error, axis=0))
    return rot, trans, trans_error
