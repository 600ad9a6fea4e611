"""On-device pose-graph optimization (Levenberg-Marquardt with line
processes for loop-edge robustness).

TPU-native replacement for Open3D's GlobalOptimization(LM) used by the
reference loop closure (reference src/neural_point.py:918-935 with
GlobalOptimizationOption(edge_prune_threshold=prune_pgo,
preference_loop_closure=lc_pref), edges assembled in
src/common.py:807-827: odometry edges certain, loop edges uncertain).

Model (Choi et al., Robust Reconstruction of Indoor Scenes, CVPR 2015 —
the algorithm Open3D implements): minimize over node poses X and line
process weights l_e,

  sum_certain r_e^T I_e r_e + sum_uncertain l_e r_e^T I_e r_e
                                + mu * (sqrt(l_e) - 1)^2

with r_e = log(Z_e^{-1} X_i^{-1} X_j). l has the closed form
l_e = (mu / (mu + r^T I r))^2. The graphs here are tiny (<= ~100 nodes), so
one dense 6N x 6N solve per LM step jits trivially; Jacobians come from
autodiff of the residual at zero right-perturbation (exact).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lie import se3_exp, se3_inv, se3_log


class PoseGraph(NamedTuple):
    """nodes: (N,4,4); edges i->j with measured relative pose Z (i_T_j),
    6x6 information matrices, and certainty flags (odometry=True)."""

    nodes: jnp.ndarray        # (N, 4, 4)
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,) int32
    edge_z: jnp.ndarray       # (E, 4, 4)
    edge_info: jnp.ndarray    # (E, 6, 6)
    certain: jnp.ndarray      # (E,) bool


def edge_residuals(nodes, g: PoseGraph):
    Xi = nodes[g.edge_i]
    Xj = nodes[g.edge_j]
    return se3_log(se3_inv(g.edge_z) @ se3_inv(Xi) @ Xj)  # (E, 6)


def _adjoint(T):
    """SE(3) adjoint in [rho, phi] ordering: [[R, hat(t)R], [0, R]]."""
    from .lie import hat

    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, hat(t) @ R], -1)
    bot = jnp.concatenate([Z, R], -1)
    return jnp.concatenate([top, bot], -2)


@partial(jax.jit, static_argnames=("max_iters",))
def optimize(g: PoseGraph, preference_loop_closure: float = 5.0,
             max_iters: int = 30, lm_lambda: float = 1e-6):
    """LM with line processes. Returns (nodes, line_weights).

    Node 0 is gauge-fixed. Edge pruning (weight < threshold) is the
    caller's decision from the returned line weights, matching Open3D's
    edge_prune_threshold semantics.
    """
    N = g.nodes.shape[0]
    E = g.edge_i.shape[0]
    mu = preference_loop_closure

    def line_weights(r):
        q = jnp.einsum("ei,eij,ej->e", r, g.edge_info, r)
        l = (mu / (mu + q)) ** 2
        return jnp.where(g.certain, 1.0, l)

    def step(carry, _):
        # Choi et al. alternation: update X with the CURRENT line weights
        # (l=1 initially), then refresh l from the new residuals — computing
        # l before any X step would strangle large-residual loop edges.
        nodes, lam, l = carry
        r = edge_residuals(nodes, g)                       # (E, 6)
        # Analytic first-order Jacobians of r = log(Z^-1 Xi^-1 Xj) under
        # right perturbation (small-residual approximation Jr^-1 ~= I —
        # autodiff through so3_log is numerically singular at r -> 0):
        #   dr/d(delta_j) = I,  dr/d(delta_i) = -Ad(Xj^-1 Xi)
        Ji = -_adjoint(se3_inv(nodes[g.edge_j]) @ nodes[g.edge_i])  # (E,6,6)
        Jj = jnp.broadcast_to(jnp.eye(6), (E, 6, 6))
        Jfull = jnp.zeros((E, 6, N, 6))
        Jfull = Jfull.at[jnp.arange(E), :, g.edge_i, :].add(Ji)
        Jfull = Jfull.at[jnp.arange(E), :, g.edge_j, :].add(Jj)
        W = (l[:, None, None] * g.edge_info).reshape(E, 6, 6)
        # block-diagonal weighting: H = J^T W J, b = J^T W r
        Jb = Jfull.reshape(E, 6, N * 6)
        WJ = W @ Jb
        H = jnp.einsum("eka,ekb->ab", Jb, WJ)
        b = jnp.einsum("eka,ek->a", WJ, r)
        # gauge fix node 0
        fix = jnp.arange(N * 6) < 6
        H = jnp.where(fix[:, None] | fix[None, :],
                      jnp.where(jnp.eye(N * 6, dtype=bool), 1.0, 0.0), H)
        b = jnp.where(fix, 0.0, b)
        Hl = H + lam * jnp.eye(N * 6)
        delta = -jnp.linalg.solve(Hl, b)
        # trust region: an ill-conditioned system (e.g. a wrong loop edge
        # with near-singular information) must not fling nodes away —
        # cap each node's update to 0.5 in the se(3) norm per LM step
        d6 = delta.reshape(N, 6)
        norms = jnp.linalg.norm(d6, axis=-1, keepdims=True)
        d6 = d6 * jnp.minimum(1.0, 0.5 / jnp.maximum(norms, 1e-12))
        new_nodes = nodes @ se3_exp(d6)
        # accept if the (finite) cost decreased (simple LM schedule)
        def cost(nd):
            rr = edge_residuals(nd, g)
            return jnp.sum(l * jnp.einsum("ei,eij,ej->e", rr, g.edge_info, rr))
        new_cost = cost(new_nodes)
        better = jnp.isfinite(new_cost) & (new_cost < cost(nodes))
        nodes = jnp.where(better, new_nodes, nodes)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        l_new = line_weights(edge_residuals(nodes, g))
        return (nodes, lam, l_new), None

    (nodes, _, final_w), _ = jax.lax.scan(
        step, (g.nodes, jnp.asarray(lm_lambda), jnp.ones(E)),
        None, length=max_iters)
    return nodes, final_w


def build_odometry_chain(poses: np.ndarray, info_scale: float = 1.0):
    """Odometry edges k -> k+1 from a pose chain (host helper)."""
    n = len(poses)
    ei = np.arange(n - 1, dtype=np.int32)
    ej = ei + 1
    z = np.stack([np.linalg.inv(poses[i]) @ poses[i + 1]
                  for i in range(n - 1)])
    info = np.tile(np.eye(6) * info_scale, (n - 1, 1, 1))
    return ei, ej, z, info
