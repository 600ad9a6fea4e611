"""Masked reductions for static-shape pipelines.

The reference compacts tensors with boolean indexing (dynamic shapes); on
TPU everything stays fixed-size with a validity mask, so loss terms and
statistics need mask-aware reductions.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_sum(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0))


def masked_mean(x, mask):
    n = jnp.maximum(jnp.sum(mask), 1)
    return masked_sum(x, mask) / n


def masked_max(x, mask, fill=-jnp.inf):
    return jnp.max(jnp.where(mask, x, fill))


def masked_median(x, mask):
    """Median of the masked-in entries of a 1-D array (static shape).

    Invalid entries are pushed to +inf by the sort; the median index is
    (count-1)//2 ... count//2 averaged, matching torch.median's lower-median
    only when count is odd; torch.median returns the lower middle value for
    even counts, so we use index (count-1)//2 to match torch semantics
    (reference uses tensor.median() in Tracker.py:154 and Mapper.py:675).
    """
    x = jnp.where(mask, x, jnp.inf)
    xs = jnp.sort(x)
    count = jnp.sum(mask)
    idx = jnp.maximum((count - 1) // 2, 0)
    return xs[idx]
