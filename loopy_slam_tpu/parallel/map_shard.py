"""Map sharding: the point buffer, features and hash grid split across a
device mesh by spatial-cell ownership, with ring collectives for k-NN.

`parallel/sharded.py` scales COMPUTE (rays data-parallel, map replicated);
this module scales CAPACITY: scenes whose point buffer + optimizer state
exceed one chip's HBM. There is nothing to port from the reference —
its faiss index lives on a single GPU (SURVEY.md §2.4) — so this is a
TPU-native design:

  Ownership. Every hash-grid CELL (not point) is owned by exactly one
  shard: owner(cell) = mix(cell) & (n_shards - 1). A cell's candidate row
  is therefore complete on its owner, preserving the exactness contract of
  the 27-stencil query. Spatial hashing load-balances occupied cells
  across shards regardless of camera trajectory.

  Insertion. Frame point batches are tiny (KBs) and already replicated;
  each shard masks the batch to the cells it owns and performs the normal
  masked-compact insertion into its LOCAL buffer + grid. No communication.

  Query (k-NN): ring top-k. Each shard's query batch visits every shard
  around the ICI ring (jax.lax.ppermute). At each of the n steps the
  holder runs the ordinary single-chip Pallas selection against its LOCAL
  grid and merges (2k -> k by packed distance key) into the queries'
  running best, tagging winners with the holder's shard id. Rotating
  state per query: xyz + k*(D, local index, owner) — ~100 B, so a 25k
  sample batch moves ~2.5 MB per step over ICI (microseconds), while the
  gather + selection compute parallelizes n-ways.

  Feature fetch: ring fill. A second ring pass rotates (I, owner, acc);
  each holder fills the rows it owns from its local packed
  [geo || color || xyz] table. This is the expensive ring: k*(2c+3) f32
  per query per step (~2 MB/step/shard at 25k queries, c=32) — still
  well under an ICI hop. Its VJP (autodiff through ppermute + where)
  routes feature gradients back to the owning shard's buffer, which is
  exactly the sharded scatter-add the optimizer needs.

  Decode. The fetched block feeds models.renderer.decode_neighbors — the
  IDENTICAL single-chip decode path — so sharded rendering/training has
  the same semantics as the replicated path by construction.

Validated by tests/test_map_shard.py on an 8-device CPU mesh: query/fetch
parity against the single-device kNN + gather, insertion partition
parity, and a gradient-flow check through the ring fetch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import knn

AXIS = "shard"

# Cell-ownership mixing primes — deliberately different from the
# table-hash primes in ops/knn.py so shard choice is uncorrelated with
# table slot (a correlated pair would pile every shard's table load onto
# 1/n of its rows).
_Q1, _Q2, _Q3 = np.int32(92837111), np.int32(689287499), np.int32(283923481)


def owner_of_cells(ijk: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """int32 cell coords (..., 3) -> owning shard id in [0, n_shards)."""
    h = (ijk[..., 0] * _Q1) ^ (ijk[..., 1] * _Q2) ^ (ijk[..., 2] * _Q3)
    return h & jnp.int32(n_shards - 1)


def owner_of_points(pts: jnp.ndarray, cell_size, n_shards: int):
    return owner_of_cells(jnp.floor(pts / cell_size).astype(jnp.int32),
                          n_shards)


class ShardedMap(NamedTuple):
    """Per-shard map arrays (leading axis = local rows on each device).

    Under shard_map these appear with their LOCAL shapes; at the host
    level they are device arrays sharded on the mesh (leading axis
    stacked: (n, cap_l, ...)).
    """

    pos: jnp.ndarray    # (cap_l, 3)
    feat: jnp.ndarray   # (cap_l, 2c)
    count: jnp.ndarray  # () int32 valid prefix per shard
    grid: knn.HashGrid  # local index over pos[:count]


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n & (n - 1) == 0, "shard count must be a power of two"
    return Mesh(np.array(devs[:n]), (AXIS,))


def init_sharded_map(mesh: Mesh, cap_local: int, c_dim: int, cell_size,
                     table_size: int, max_per_cell: int) -> ShardedMap:
    """Allocate an empty sharded map (host-level, mesh-sharded arrays)."""
    n = mesh.devices.size

    @partial(jax.shard_map, mesh=mesh, in_specs=(), out_specs=ShardedMap(
        pos=P(AXIS), feat=P(AXIS), count=P(AXIS),
        grid=knn.HashGrid(cell_data=P(AXIS), cell_size=P(AXIS),
                          n_dropped=P(AXIS), cell_fill=P(AXIS))))
    def _init():
        pos = jnp.zeros((cap_local, 3), jnp.float32)
        grid = knn.build(pos, jnp.zeros((cap_local,), bool), cell_size,
                         table_size, max_per_cell)
        return ShardedMap(
            pos=pos[None],
            feat=jnp.zeros((1, cap_local, 2 * c_dim), jnp.float32)[0][None],
            count=jnp.zeros((1,), jnp.int32),
            grid=jax.tree.map(lambda x: x[None], grid))

    smap = _init()
    # count is per-shard scalar stacked to (n,); grid leaves likewise
    return smap


def shard_insert(smap: ShardedMap, new_pts, new_feat, new_valid,
                 cell_size, table_size: int, n_shards: int):
    """Per-shard masked insertion of a replicated candidate batch.

    Runs INSIDE shard_map. Each shard keeps rows whose cell it owns;
    slots are compacted locally. Returns the updated local map.
    """
    me = jax.lax.axis_index(AXIS)
    mine = new_valid & (owner_of_points(new_pts, cell_size, n_shards) == me)
    cap_l = smap.pos.shape[0]
    rank = jnp.cumsum(mine.astype(jnp.int32)) - 1
    dest = smap.count + rank
    ok = mine & (dest < cap_l)
    dest = jnp.where(ok, dest, cap_l)
    pos = smap.pos.at[dest].set(new_pts, mode="drop")
    feat = smap.feat.at[dest].set(new_feat, mode="drop")
    count = smap.count + jnp.sum(ok).astype(jnp.int32)
    grid = knn.insert(smap.grid, table_size, new_pts, dest, ok)
    return ShardedMap(pos=pos, feat=feat, count=count, grid=grid)


def _merge_topk(bestD, bestI, bestO, D_new, I_new, O_new, k: int):
    """Merge two (Q, k) candidate sets into the k smallest by D.

    Duplicates cannot arise: every point lives on exactly one shard and
    each shard is visited once per ring pass.
    """
    D = jnp.concatenate([bestD, D_new], axis=1)
    I = jnp.concatenate([bestI, I_new], axis=1)
    O = jnp.concatenate([bestO, O_new], axis=1)
    negD, sel = jax.lax.top_k(-D, k)  # top_k is stable: ties keep order
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    return -negD, take(I), take(O)


def ring_knn(smap: ShardedMap, queries, k: int, radius, table_size: int,
             max_per_cell: int, n_shards: int):
    """Global k-NN of per-shard query batches over the sharded map.

    Runs INSIDE shard_map. queries: (Qd, 3) — this shard's own batch.
    radius: scalar or (Qd,). Returns (D, I, owner, neighbor_num) with I a
    LOCAL row index into the owner shard's buffers.

    The rotating state visits all n shards and arrives home after n
    ppermute hops (the merge work overlaps the next hop's transfer).
    """
    me = jax.lax.axis_index(AXIS)
    Qd = queries.shape[0]
    r = jnp.asarray(radius, jnp.float32)
    r_rot = jnp.broadcast_to(r, (Qd,)) if r.ndim <= 1 else r
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    carry = (queries, jnp.broadcast_to(r_rot, (Qd,)),
             jnp.full((Qd, k), 1e10, jnp.float32),
             jnp.zeros((Qd, k), jnp.int32),
             jnp.full((Qd, k), -1, jnp.int32))
    for _ in range(n_shards):
        q, rr, bestD, bestI, bestO = carry
        D_loc, I_loc, _ = knn.query(smap.grid, smap.pos, q, k, rr,
                                    table_size, max_per_cell)
        O_loc = jnp.where(D_loc < 1e10, me, -1).astype(jnp.int32)
        bestD, bestI, bestO = _merge_topk(bestD, bestI, bestO,
                                          D_loc, I_loc, O_loc, k)
        carry = jax.tree.map(
            lambda t: jax.lax.ppermute(t, AXIS, perm),
            (q, rr, bestD, bestI, bestO))
    q, rr, D, I, O = carry  # home again after n hops
    r2 = rr[:, None] ** 2
    neighbor_num = jnp.sum(D < r2, axis=-1).astype(jnp.int32)
    return D, I, O, neighbor_num


def ring_fetch(smap: ShardedMap, I, owner, n_shards: int):
    """Gather packed [feat || pos] rows for (owner, local-index) pairs.

    Runs INSIDE shard_map. I, owner: (Qd, k). Returns (Qd, k, 2c+3).
    Differentiable: the VJP reverses the ring and scatter-adds each
    shard's share of the feature gradient into its local buffer.
    """
    Qd, k = I.shape
    me = jax.lax.axis_index(AXIS)
    featpos = jnp.concatenate(
        [smap.feat, jax.lax.stop_gradient(smap.pos)], axis=1)
    F = featpos.shape[1]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    carry = (I, owner, jnp.zeros((Qd, k, F), featpos.dtype))
    for _ in range(n_shards):
        Ir, Or, acc = carry
        vals = jnp.take(featpos, Ir.reshape(-1), axis=0).reshape(Qd, k, F)
        acc = jnp.where((Or == me)[..., None], vals, acc)
        carry = jax.tree.map(
            lambda t: jax.lax.ppermute(t, AXIS, perm), (Ir, Or, acc))
    _, _, acc = carry
    return acc


def make_sharded_eval_points(mesh: Mesh, opts, stage: str):
    """Build a shard_map'ed eval_points over a map-sharded point cloud.

    Decoder params are replicated; every shard evaluates its OWN sample
    batch (rays stay data-parallel) against the globally-sharded map and
    decodes with the stock single-chip decode_neighbors. Returns
    eval(params, smap, pts_local, key) -> (occ, rgb, has_neighbors), all
    sharded along the sample axis.
    """
    from ..models.renderer import decode_neighbors

    n = mesh.devices.size
    grid_spec = knn.HashGrid(cell_data=P(AXIS), cell_size=P(AXIS),
                             n_dropped=P(AXIS), cell_fill=P(AXIS))
    smap_spec = ShardedMap(pos=P(AXIS), feat=P(AXIS), count=P(AXIS),
                           grid=grid_spec)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), smap_spec, P(AXIS), P()),
             out_specs=(P(AXIS), P(AXIS), P(AXIS)),
             check_vma=False)
    def _eval(params, smap_st, pts, key):
        smap = jax.tree.map(lambda x: x[0], smap_st)  # drop stacked axis
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        D, I, owner, nn_count = ring_knn(
            smap, jax.lax.stop_gradient(pts), opts.nn_num,
            opts.radius_query, opts.table_size, opts.max_per_cell, n)
        both = ring_fetch(smap, I, owner, n)
        return decode_neighbors(params, pts, key, opts, stage, D, both,
                                nn_count, opts.radius_query)

    return _eval


def make_shard_insert(mesh: Mesh, cell_size, table_size: int):
    """Build a jitted host-level insertion step over the sharded map."""
    n = mesh.devices.size
    grid_spec = knn.HashGrid(cell_data=P(AXIS), cell_size=P(AXIS),
                             n_dropped=P(AXIS), cell_fill=P(AXIS))
    smap_spec = ShardedMap(pos=P(AXIS), feat=P(AXIS), count=P(AXIS),
                           grid=grid_spec)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(smap_spec, P(), P(), P()),
             out_specs=smap_spec,
             check_vma=False)
    def _insert(smap_st, new_pts, new_feat, new_valid):
        smap = jax.tree.map(lambda x: x[0], smap_st)
        out = shard_insert(smap, new_pts, new_feat, new_valid,
                           cell_size, table_size, n)
        return jax.tree.map(lambda x: x[None], out)

    return jax.jit(_insert)
