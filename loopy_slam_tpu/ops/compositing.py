"""Occupancy-based volume compositing.

JAX equivalent of the reference's raw2outputs_nerf_color
(src/common.py:382-422): occupancy = sigmoid(coef * raw), front-to-back
alpha compositing, weight-normalized color/depth, and the depth-variance
uncertainty of Point-SLAM eq. (7). Note the reference computes ray-interval
`dists` but never uses them (occupancy compositing, not density), so they
are omitted here.
"""

from __future__ import annotations

import jax.numpy as jnp


def composite(raw_rgb, raw_occ, z_vals, coef: float = 0.1):
    """Alpha-composite along each ray.

    Args:
      raw_rgb: (R, S, 3) raw color (already activated / sigmoided upstream).
      raw_occ: (R, S) raw occupancy logits (pre-sigmoid; -100 marks samples
        without point neighbors, cf. reference Renderer.py:184-186).
      z_vals:  (R, S) sample depths along the ray.
      coef:    sigmoid temperature (rendering.sigmoid_coef_*).

    Returns:
      depth (R,), depth_var (R,), rgb (R, 3), weights (R, S)
    """
    alpha = jnp.asarray(
        jnp.reciprocal(1.0 + jnp.exp(-coef * raw_occ)), dtype=jnp.float32
    )
    # transmittance: cumprod of (1 - alpha + 1e-10), exclusive
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]), (1.0 - alpha + 1e-10)], axis=-1
        ),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-10
    rgb = jnp.sum(weights[..., None] * raw_rgb, axis=-2) / weights_sum
    depth = jnp.sum(weights * z_vals, axis=-1) / weights_sum[..., 0]
    dev = z_vals - depth[..., None]
    depth_var = jnp.sum(weights * dev * dev, axis=-1)
    return depth, depth_var, rgb, weights
