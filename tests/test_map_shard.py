"""Map-sharding parity on the 8-device CPU mesh.

The sharded path (parallel/map_shard.py) must reproduce the single-device
kNN + gather + decode semantics exactly: every point lives on one shard,
ring top-k visits all shards, and decode_neighbors is shared code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loopy_slam_tpu.ops import knn
from loopy_slam_tpu.parallel import map_shard
from loopy_slam_tpu.models.renderer import RenderOptions, eval_points
from loopy_slam_tpu.models.decoder import init_decoders

TABLE = 2 ** 14
M = 16
CELL = 0.4
RADIUS = 0.35
CAP_L = 1024
C_DIM = 32


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return map_shard.make_mesh(8)


def _scene(rng, n=1500):
    pts = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 2 * C_DIM)).astype(np.float32) * 0.1
    return jnp.asarray(pts), jnp.asarray(feats)


def _build_sharded(mesh, pts, feats):
    smap = map_shard.init_sharded_map(mesh, CAP_L, C_DIM, CELL, TABLE, M)
    insert = map_shard.make_shard_insert(mesh, CELL, TABLE)
    return insert(smap, pts, feats, jnp.ones(pts.shape[0], bool))


def test_insertion_partitions_points(rng):
    mesh = _mesh()
    pts, feats = _scene(rng)
    smap = _build_sharded(mesh, pts, feats)
    counts = np.asarray(smap.count)
    assert counts.sum() == pts.shape[0]
    # every point appears exactly once, on the shard owning its cell
    owner = np.asarray(map_shard.owner_of_points(pts, CELL, 8))
    for s in range(8):
        got = np.sort(np.asarray(smap.pos[s])[:counts[s]], axis=0)
        want = np.sort(np.asarray(pts)[owner == s], axis=0)
        np.testing.assert_allclose(got, want)


def test_ring_knn_matches_single_device(rng):
    mesh = _mesh()
    pts, feats = _scene(rng)
    smap = _build_sharded(mesh, pts, feats)
    Q = 64  # 8 per shard
    q = jnp.asarray(rng.uniform(-0.9, 0.9, size=(Q, 3)).astype(np.float32))

    from functools import partial
    from jax.sharding import PartitionSpec as P
    grid_spec = knn.HashGrid(cell_data=P(map_shard.AXIS),
                             cell_size=P(map_shard.AXIS),
                             n_dropped=P(map_shard.AXIS),
                             cell_fill=P(map_shard.AXIS))
    smap_spec = map_shard.ShardedMap(pos=P(map_shard.AXIS),
                                     feat=P(map_shard.AXIS),
                                     count=P(map_shard.AXIS),
                                     grid=grid_spec)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(smap_spec, P(map_shard.AXIS)),
             out_specs=(P(map_shard.AXIS),) * 2,
             check_vma=False)
    def run(smap_st, q_local):
        smap_l = jax.tree.map(lambda x: x[0], smap_st)
        D, I, O, nn = map_shard.ring_knn(smap_l, q_local, 8, RADIUS,
                                         TABLE, M, 8)
        both = map_shard.ring_fetch(smap_l, I, O, 8)
        return D, both

    D_sh, both_sh = run(smap, q)

    # single-device reference over the same logical point set
    cap = 4096
    pos1 = jnp.zeros((cap, 3)).at[:pts.shape[0]].set(pts)
    valid1 = jnp.arange(cap) < pts.shape[0]
    grid1 = knn.build(pos1, valid1, CELL, TABLE, M)
    D_1, I_1, nn_1 = knn.query(grid1, pos1, q, 8, RADIUS, TABLE, M)

    D_sh, D_1 = np.asarray(D_sh), np.asarray(D_1)
    # same distance multisets (ordering may tie-break differently)
    np.testing.assert_allclose(np.sort(D_sh, axis=1), np.sort(D_1, axis=1),
                               rtol=1e-5)
    # fetched positions must reproduce the distances
    pos_sh = np.asarray(both_sh[..., 2 * C_DIM:])
    qn = np.asarray(q)
    d2 = ((pos_sh - qn[:, None, :]) ** 2).sum(-1)
    real = D_sh < 1e9
    np.testing.assert_allclose(np.sort(np.where(real, d2, 1e10), axis=1),
                               np.sort(D_1, axis=1), rtol=3e-4)


def test_sharded_eval_points_matches_single_device(rng):
    mesh = _mesh()
    pts, feats = _scene(rng)
    smap = _build_sharded(mesh, pts, feats)

    import copy
    from loopy_slam_tpu.config import DEFAULTS
    cfg = copy.deepcopy(DEFAULTS)
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    opts = RenderOptions(nn_num=8, min_nn_num=1, radius_query=RADIUS,
                         table_size=TABLE, max_per_cell=M,
                         encode_rel_pos_in_col=True)

    Q = 64
    # queries near points so every one has neighbors (no RNG noise path,
    # which would differ between the replicated and sharded key streams)
    qi = rng.integers(0, pts.shape[0], size=Q)
    q = jnp.asarray(np.asarray(pts)[qi] + 0.01)

    ev = map_shard.make_sharded_eval_points(mesh, opts, "color")
    occ_sh, rgb_sh, hn_sh = ev(params, smap, q, jax.random.PRNGKey(3))

    cap = 4096
    pos1 = jnp.zeros((cap, 3)).at[:pts.shape[0]].set(pts)
    valid1 = jnp.arange(cap) < pts.shape[0]
    grid1 = knn.build(pos1, valid1, CELL, TABLE, M)
    feats1 = jnp.zeros((cap, 2 * C_DIM)).at[:pts.shape[0]].set(feats)
    occ_1, rgb_1, hn_1 = eval_points(params, pos1, grid1, feats1, q,
                                     jax.random.PRNGKey(3), opts, "color")

    assert np.asarray(hn_sh).all() and np.asarray(hn_1).all()
    np.testing.assert_allclose(np.asarray(occ_sh), np.asarray(occ_1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb_sh), np.asarray(rgb_1),
                               rtol=1e-4, atol=1e-4)


def test_feature_gradients_flow_to_owner_shards(rng):
    mesh = _mesh()
    pts, feats = _scene(rng, n=400)
    smap = _build_sharded(mesh, pts, feats)

    import copy
    from loopy_slam_tpu.config import DEFAULTS
    cfg = copy.deepcopy(DEFAULTS)
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    opts = RenderOptions(nn_num=8, min_nn_num=1, radius_query=RADIUS,
                         table_size=TABLE, max_per_cell=M)
    Q = 64
    qi = rng.integers(0, pts.shape[0], size=Q)
    q = jnp.asarray(np.asarray(pts)[qi] + 0.01)
    ev = map_shard.make_sharded_eval_points(mesh, opts, "color")

    def loss(feat_shards):
        smap2 = smap._replace(feat=feat_shards)
        occ, rgb, hn = ev(params, smap2, q, jax.random.PRNGKey(3))
        return jnp.sum(occ ** 2) + jnp.sum(rgb)

    g = jax.grad(loss)(smap.feat)
    g = np.asarray(g)
    counts = np.asarray(smap.count)
    # gradients land ONLY in valid rows, and some shard sees signal
    assert np.abs(g).sum() > 0
    for s in range(8):
        assert np.abs(g[s, counts[s]:]).sum() == 0
