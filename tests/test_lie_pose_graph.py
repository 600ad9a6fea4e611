import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.ops import lie
from loopy_slam_tpu.ops.pose_graph import (PoseGraph, build_odometry_chain,
                                           edge_residuals, optimize)


def test_se3_exp_log_round_trip(rng):
    xi = rng.normal(size=(20, 6)).astype(np.float32) * 0.5
    T = lie.se3_exp(jnp.asarray(xi))
    back = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-4)
    # inverse
    TT = np.asarray(T @ lie.se3_inv(T))
    np.testing.assert_allclose(TT, np.tile(np.eye(4), (20, 1, 1)), atol=1e-5)


def test_so3_small_angle(rng):
    phi = rng.normal(size=(5, 3)).astype(np.float32) * 1e-7
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (5, 1, 1)), atol=1e-6)


def _random_trajectory(rng, n):
    poses = [np.eye(4)]
    for _ in range(n - 1):
        xi = np.concatenate([rng.normal(size=3) * 0.1,
                             rng.normal(size=3) * 0.05])
        poses.append(poses[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi))))
    return np.stack(poses).astype(np.float32)


def test_pose_graph_corrects_drift(rng):
    """Classic loop: noisy odometry + one exact loop edge back to start."""
    n = 12
    gt = _random_trajectory(rng, n)
    # corrupt odometry measurements with noise -> drifted initial nodes
    zs = []
    for i in range(n - 1):
        z = np.linalg.inv(gt[i]) @ gt[i + 1]
        noise = np.concatenate([rng.normal(size=3) * 0.02,
                                rng.normal(size=3) * 0.01])
        zs.append(z @ np.asarray(lie.se3_exp(jnp.asarray(noise))))
    nodes = [np.eye(4, dtype=np.float32)]
    for z in zs:
        nodes.append((nodes[-1] @ z).astype(np.float32))
    nodes = np.stack(nodes)

    ei = list(range(n - 1)) + [0, 3, 0]
    ej = list(range(1, n)) + [n - 1, n - 2, n // 2]
    z_all = zs + [np.linalg.inv(gt[0]) @ gt[n - 1],
                  np.linalg.inv(gt[3]) @ gt[n - 2],
                  np.linalg.inv(gt[0]) @ gt[n // 2]]
    info = np.tile(np.eye(6, dtype=np.float32), (len(ei), 1, 1))
    info[n - 1:] *= 50.0  # loop edges are exact -> high information
    certain = np.array([True] * (n - 1) + [False, False, False])

    g = PoseGraph(jnp.asarray(nodes), jnp.asarray(ei, jnp.int32),
                  jnp.asarray(ej, jnp.int32),
                  jnp.asarray(np.stack(z_all), jnp.float32),
                  jnp.asarray(info), jnp.asarray(certain))
    opt_nodes, w = optimize(g, preference_loop_closure=5.0, max_iters=40)
    opt_nodes = np.asarray(opt_nodes)

    err_before = np.linalg.norm(nodes[:, :3, 3] - gt[:, :3, 3], axis=-1)
    err_after = np.linalg.norm(opt_nodes[:, :3, 3] - gt[:, :3, 3], axis=-1)
    assert err_after.mean() < 0.5 * err_before.mean(), (
        err_before.mean(), err_after.mean())
    # valid loop edges survive (line weight high)
    assert np.asarray(w)[-2:].min() > 0.25


def test_pose_graph_prunes_bad_loop_edge(rng):
    n = 8
    gt = _random_trajectory(rng, n)
    ei, ej, z, info = build_odometry_chain(gt)
    # append a WRONG loop edge (random transform)
    bad = np.eye(4)
    bad[:3, 3] = [1.5, -1.0, 0.8]
    ei = np.concatenate([ei, [0]])
    ej = np.concatenate([ej, [n - 1]])
    z = np.concatenate([z, bad[None]])
    # realistic information scale: the reference derives info matrices from
    # registration correspondences (hundreds-thousands of points)
    info = np.concatenate([info, np.eye(6)[None]]) * 100.0
    certain = np.array([True] * (n - 1) + [False])
    g = PoseGraph(jnp.asarray(gt), jnp.asarray(ei, jnp.int32),
                  jnp.asarray(ej, jnp.int32), jnp.asarray(z, jnp.float32),
                  jnp.asarray(info, jnp.float32), jnp.asarray(certain))
    nodes, w = optimize(g, max_iters=30)
    # the inconsistent loop edge gets a low line-process weight...
    assert float(np.asarray(w)[-1]) < 0.25
    # ...and the trajectory is not dragged toward it
    drift = np.linalg.norm(np.asarray(nodes)[:, :3, 3] - gt[:, :3, 3],
                           axis=-1)
    assert drift.max() < 0.15, drift


def test_edge_residual_zero_on_consistent_graph(rng):
    gt = _random_trajectory(rng, 6)
    ei, ej, z, info = build_odometry_chain(gt)
    g = PoseGraph(jnp.asarray(gt), jnp.asarray(ei, jnp.int32),
                  jnp.asarray(ej, jnp.int32), jnp.asarray(z, jnp.float32),
                  jnp.asarray(info, jnp.float32),
                  jnp.ones(len(ei), bool))
    r = np.asarray(edge_residuals(jnp.asarray(gt), g))
    assert np.abs(r).max() < 1e-4
