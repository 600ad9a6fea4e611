"""Image ops: bilinear sampling (JAX) and host-side gradient utilities.

Replaces the reference's cv2.remap frustum depth lookup (src/Mapper.py:
196-203) with a jittable bilinear gather, and reproduces the skimage
sobel_h/sobel_v + rgb2gray pipeline used for dynamic query radii and
gradient-based pixel selection (src/Tracker.py:243-258, src/common.py:
175-234) without the skimage dependency.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear sample img[H, W] at float pixel coords (u=col, v=row).

    Out-of-image taps contribute zero (cv2.remap BORDER_CONSTANT parity).
    """
    H, W = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    def tap(vv, uu, w):
        inb = (uu >= 0) & (uu <= W - 1) & (vv >= 0) & (vv <= H - 1)
        uc = jnp.clip(uu.astype(jnp.int32), 0, W - 1)
        vc = jnp.clip(vv.astype(jnp.int32), 0, H - 1)
        return jnp.where(inb, img[vc, uc] * w, 0.0)

    return (tap(v0, u0, (1 - du) * (1 - dv))
            + tap(v0, u0 + 1, du * (1 - dv))
            + tap(v0 + 1, u0, (1 - du) * dv)
            + tap(v0 + 1, u0 + 1, du * dv))


# --------------------------- host-side (numpy) ----------------------------

_SOBEL = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float64) / 4.0


def rgb2gray(rgb: np.ndarray) -> np.ndarray:
    """skimage-compatible luminance (ITU-R 601-2 weights)."""
    return rgb @ np.array([0.2125, 0.7154, 0.0721])


def _conv2_reflect(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    p = np.pad(img, 1, mode="reflect")
    out = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out += k[dy, dx] * p[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out


def sobel_grad_mag(gray: np.ndarray) -> np.ndarray:
    """sqrt(sobel_h^2 + sobel_v^2), skimage kernel normalization."""
    gh = _conv2_reflect(gray, _SOBEL)
    gv = _conv2_reflect(gray, _SOBEL.T)
    return np.sqrt(gh * gh + gv * gv)


def dynamic_radius_maps(color: np.ndarray, radius_add_max, radius_add_min,
                        radius_query_ratio, color_grad_threshold):
    """Per-pixel add/query radii from color gradient magnitude.

    Piecewise-linear map [0, 0.01, thr] -> [r_max, r_max, r_min] (reference
    src/Tracker.py:243-258: scipy interp1d on the clipped gradient).
    """
    g = np.clip(sobel_grad_mag(rgb2gray(color)), 0.0, color_grad_threshold)
    t = np.clip((g - 0.01) / max(color_grad_threshold - 0.01, 1e-12), 0.0, 1.0)
    r_add = radius_add_max + (radius_add_min - radius_add_max) * t
    r_query = radius_query_ratio * r_add
    return r_add.astype(np.float32), r_query.astype(np.float32)


def select_pixels_by_grad(H0, H1, W0, W1, n, color: np.ndarray, ratio=15,
                          gt_depth=None, depth_limit=False, rng=None):
    """Indices (flat, row-major) of n pixels sampled from the top ratio*n
    color-gradient pixels inside the region (reference src/common.py:200-234).

    Returns (flat_indices, grad_mag). The caller re-samples from this pool
    each iteration.
    """
    grad_mag = sobel_grad_mag(rgb2gray(color))
    img_size = color.shape[:2]
    k = min(ratio * n, grad_mag.size - 1)
    sel = np.argpartition(grad_mag, -k, axis=None)[-k:]
    h, w = np.unravel_index(sel, img_size)
    mask = (h >= H0) & (h < H1) & (w >= W0) & (w < W1)
    if gt_depth is not None:
        dv = gt_depth[h, w]
        mask &= (dv > 0.0) & ((dv <= 5.0) if depth_limit else True)
    h, w = h[mask], w[mask]
    return np.ravel_multi_index(np.array([h, w]), img_size), grad_mag
