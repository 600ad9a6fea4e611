"""SO(3)/SE(3) Lie-group operations (exp/log), differentiable JAX.

Used by the pose-graph solver and registration (the reference delegates all
of this to Open3D's C++ pipelines, reference src/common.py:592-839).
Conventions: tangent vectors are [rho(3), phi(3)] (translation, rotation),
exp uses the full SE(3) exponential with the V matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(phi):
    """(...,3) -> (...,3,3) rotation, Rodrigues with Taylor fallback.

    Differentiable at phi = 0: the angle is computed through a
    double-where so the exact branch never sees theta = 0 (whose sqrt/div
    would poison gradients with NaN even when unselected).
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-10
    th = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = hat(phi)
    K2 = K @ K
    # sin(t)/t and (1-cos t)/t^2 with stable small-angle expansions
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / (th * th))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """(...,3,3) -> (...,3) rotation vector."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    s = jnp.sin(theta)[..., None]
    th = theta[..., None]
    # w = 2 sin(theta) * axis ; handle small angles by series
    scale = jnp.where(th < 1e-5, 0.5 + th**2 / 12.0, th / (2.0 * s + _EPS))
    return w * scale


def _V(phi):
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-10
    th = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = hat(phi)
    K2 = K @ K
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(th)) / (th * th))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (th - jnp.sin(th)) / (th * th * th))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + b * K + c * K2


def se3_exp(xi):
    """(...,6) [rho, phi] -> (...,4,4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_V(phi) @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def se3_log(T):
    """(...,4,4) -> (...,6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    Vinv = jnp.linalg.inv(_V(phi))
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def se3_inv(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)
