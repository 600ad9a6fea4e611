"""Pixel/ray sampling and depth-guided z-value generation.

Static-shape JAX equivalents of the reference samplers
(src/common.py:123-298) and the renderer's z-val logic
(src/utils/Renderer.py:98-165). Where the reference compacts via boolean
indexing, these return a fixed-size batch plus a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import rays_from_uv
from .masked import masked_max, masked_median


def sample_pixels(key, H0, H1, W0, W1, n, depth, color):
    """Uniformly sample n pixels from image region rows [H0,H1) cols [W0,W1).

    Returns (i_cols, j_rows, depth_n, color_n) — same contract as reference
    get_sample_uv/select_uv (src/common.py:123-172) but fixed-size (no
    depth filtering here; callers mask on depth > 0).
    """
    kh, kw = jax.random.split(key)
    j = jax.random.randint(kh, (n,), H0, H1)
    i = jax.random.randint(kw, (n,), W0, W1)
    return (
        i.astype(jnp.float32),
        j.astype(jnp.float32),
        depth[j, i],
        color[j, i],
    )


def sample_rays(key, H0, H1, W0, W1, n, c2w, depth, color, fx, fy, cx, cy,
                depth_limit=None):
    """Sample n rays with gt depth/color and validity mask.

    Mask semantics match reference get_samples(depth_filter=True)
    (src/common.py:237-259): valid iff depth > 0 (and < depth_limit if set).
    """
    i, j, d, c = sample_pixels(key, H0, H1, W0, W1, n, depth, color)
    rays_o, rays_d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    mask = d > 0
    if depth_limit is not None:
        mask = mask & (d < depth_limit)
    return rays_o, rays_d, d, c, mask, i.astype(jnp.int32), j.astype(jnp.int32)


def inside_mask_from_depth(gt_depth, valid):
    """Outlier gate: depth <= min(10*median, 1.2*max) over the valid batch.

    Matches reference Tracker.py:153-160 / Mapper.py:674-676.
    """
    med = masked_median(gt_depth, valid)
    mx = masked_max(gt_depth, valid, fill=0.0)
    return valid & (gt_depth <= jnp.minimum(10.0 * med, 1.2 * mx))


def surface_z_vals(gt_depth, valid, n_surface, near_end_surface, far_end_surface,
                   near_end, far_fallback=10.0):
    """Depth-guided sample depths per ray, (R, n_surface).

    Rays with gt depth > 0 get n_surface samples stratified in
    [near_end_surface*d, far_end_surface*d]; zero-depth rays get a uniform
    linspace [near_end, far] where far = clamp(min(5*mean_d, 1.2*max_d),
    0, 1.2*max_d) — the `sample_near_pcl=False` path of the reference
    renderer (src/utils/Renderer.py:102-165). (The sample-near-pcl variant
    lives in mapping/point_cloud.py: sample_near_pcl_z_vals.)
    """
    t = jnp.linspace(0.0, 1.0, n_surface)
    d = gt_depth[:, None]
    z_surface = near_end_surface * d * (1.0 - t) + far_end_surface * d * t

    mean_d = jnp.sum(jnp.where(valid, gt_depth, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    max_d = masked_max(gt_depth, valid, fill=0.0)
    far_bb = jnp.minimum(5.0 * mean_d, 1.2 * max_d)
    far = jnp.where(max_d > 0, jnp.clip(far_bb, 0.0, 1.2 * max_d), far_fallback)
    z_uniform = jnp.broadcast_to(
        near_end * (1.0 - t) + far * t, z_surface.shape)

    has_depth = (gt_depth > 0)[:, None]
    return jnp.where(has_depth, z_surface, z_uniform)


def pixels_to_points(rays_o, rays_d, z_vals):
    """(R,3),(R,3),(R,S) -> sample positions (R,S,3)."""
    return rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
