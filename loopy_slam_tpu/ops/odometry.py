"""Direct RGBD frame-to-frame odometry (multi-scale photometric+geometric
Gauss-Newton).

Equivalent of the reference's optional VisualOdometer, which wraps Open3D's
tensor hybrid RGBD odometry (reference src/utils/visual_odometer.py:18-74,
disabled by default, configs/point_slam.yaml:40). Used as an alternative
motion model for tracking initialization.

Residuals per valid source pixel p with depth d:
  photometric  I_tgt(pi(T p)) - I_src(p)
  geometric    w_g * (z(T p) - D_tgt(pi(T p)))
minimized over xi in se(3) by Gauss-Newton with Huber weights, coarse to
fine over an image pyramid. Jacobians come from jacfwd through the bilinear
samplers at xi = 0 (exact).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample
from .lie import se3_exp


def _downsample2(img):
    H, W = img.shape[:2]
    H2, W2 = H - H % 2, W - W % 2
    img = img[:H2, :W2]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                   + img[0::2, 1::2] + img[1::2, 1::2])


def _gray(color):
    return color @ jnp.asarray([0.2125, 0.7154, 0.0721])


def _level(gray, depth, intr, k: int):
    fx, fy, cx, cy = intr
    for _ in range(k):
        gray = _downsample2(gray)
        depth = _downsample2(depth)  # average-pooled depth (coarse init aid)
        fx, fy, cx, cy = fx / 2, fy / 2, (cx + 0.5) / 2 - 0.5, \
            (cy + 0.5) / 2 - 0.5
    return gray, depth, (fx, fy, cx, cy)


def _residuals(xi, T, src_pts, src_int, tgt_gray, tgt_depth, intr,
               w_geo: float):
    fx, fy, cx, cy = intr
    Tc = se3_exp(xi) @ T
    p = src_pts @ Tc[:3, :3].T + Tc[:3, 3]
    z = -p[:, 2]
    u = fx * p[:, 0] / jnp.maximum(z, 1e-6) + cx
    v = -fy * p[:, 1] / jnp.maximum(z, 1e-6) + cy
    H, W = tgt_gray.shape
    inb = (z > 1e-4) & (u >= 1) & (u <= W - 2) & (v >= 1) & (v <= H - 2)
    it = bilinear_sample(tgt_gray, u, v)
    dt = bilinear_sample(tgt_depth, u, v)
    r_i = jnp.where(inb, it - src_int, 0.0)
    r_g = jnp.where(inb & (dt > 0), w_geo * (dt - z), 0.0)
    return jnp.concatenate([r_i, r_g]), inb


@partial(jax.jit, static_argnames=("intr", "n_levels", "iters", "stride"))
def rgbd_odometry(src_color, src_depth, tgt_color, tgt_depth,
                  intr: Tuple[float, float, float, float],
                  n_levels: int = 3, iters: int = 30, stride: int = 2,
                  w_geo: float = 5.0, huber: float = 0.1):
    """Relative transform T (4x4) with p_tgt_cam = T p_src_cam.

    The caller composes: c2w_new = c2w_prev @ inv(T) for camera motion.
    """
    sg, tg = _gray(src_color), _gray(tgt_color)
    T0 = jnp.eye(4)

    def solve_level(T, level):
        g_s, d_s, li = _level(sg, src_depth, intr, level)
        g_t, d_t, _ = _level(tg, tgt_depth, intr, level)
        fx, fy, cx, cy = li
        H, W = g_s.shape
        vv, uu = jnp.meshgrid(jnp.arange(0, H, stride, dtype=jnp.float32),
                              jnp.arange(0, W, stride, dtype=jnp.float32),
                              indexing="ij")
        uu, vv = uu.ravel(), vv.ravel()
        d = d_s[vv.astype(jnp.int32), uu.astype(jnp.int32)]
        valid = d > 0
        dirs = jnp.stack([(uu - cx) / fx, -(vv - cy) / fy,
                          -jnp.ones_like(uu)], -1)
        pts = dirs * d[:, None]
        ints = g_s[vv.astype(jnp.int32), uu.astype(jnp.int32)]
        pts = jnp.where(valid[:, None], pts, 0.0)

        def gn(i, T):
            rfn = lambda xi: _residuals(xi, T, pts, ints, g_t, d_t, li,
                                        w_geo)[0]
            r = rfn(jnp.zeros(6))
            J = jax.jacfwd(rfn)(jnp.zeros(6))
            w = 1.0 / jnp.maximum(jnp.abs(r) / huber, 1.0)  # Huber
            Hm = J.T @ (w[:, None] * J)
            b = J.T @ (w * r)
            dx = -jnp.linalg.solve(Hm + 1e-6 * jnp.eye(6), b)
            return se3_exp(dx) @ T

        return jax.lax.fori_loop(0, iters, gn, T)

    T = T0
    for level in range(n_levels - 1, -1, -1):
        T = solve_level(T, level)
    return T
