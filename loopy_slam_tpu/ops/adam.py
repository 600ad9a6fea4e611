"""Minimal Adam over pytrees with per-leaf learning rates.

The reference drives torch.optim.Adam with per-parameter-group LRs that are
rewritten every iteration (reference src/Mapper.py:562-607, Tracker.py:
317-352). Here the optimizer is a pure function so whole optimization loops
compile into one XLA program; learning rates arrive as a pytree (or scalar)
of traced values, so stage-scheduled LR changes don't recompile.

Matches torch.optim.Adam defaults: betas=(0.9, 0.999), eps=1e-8, with bias
correction.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any
    v: Any
    step: jnp.ndarray


def init(params) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=z, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def update(params, grads, state: AdamState, lr, b1=0.9, b2=0.999, eps=1e-8):
    """One Adam step. `lr` is a scalar, or a pytree matching `params` whose
    leaves are scalars (per-group learning rates)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
    if isinstance(lr, (float, int)) or hasattr(lr, "ndim"):
        lr_tree = jax.tree.map(lambda p: lr, params)
    else:
        lr_tree = lr
    new_params = jax.tree.map(
        lambda p, m_, v_, l: p - l * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps),
        params, m, v, lr_tree)
    return new_params, AdamState(m=m, v=v, step=step)
