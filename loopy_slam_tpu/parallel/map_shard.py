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


GRID_SPEC = knn.HashGrid(cell_data=P(AXIS), cell_size=P(AXIS),
                         n_dropped=P(AXIS), cell_fill=P(AXIS))
SMAP_SPEC = ShardedMap(pos=P(AXIS), feat=P(AXIS), count=P(AXIS),
                       grid=GRID_SPEC)


def _local(smap_st: ShardedMap) -> ShardedMap:
    """Strip the stacked shard axis INSIDE shard_map (local view)."""
    return jax.tree.map(lambda x: x[0], smap_st)


def _stack(smap: ShardedMap) -> ShardedMap:
    """Re-introduce the stacked shard axis before returning from shard_map."""
    return jax.tree.map(lambda x: x[None], smap)


def ring_eval_points(smap: ShardedMap, params, pts, key, opts, stage: str,
                     n_shards: int, views_d=None, r_query=None,
                     exposure_feat=None):
    """eval_points over the sharded map (runs INSIDE shard_map): ring k-NN
    + ring feature fetch + the stock single-chip decode. Drop-in for the
    renderer's eval step — render_batch_ray's eval_fn hook."""
    from ..models.renderer import decode_neighbors

    rq = opts.radius_query if r_query is None else r_query
    D, I, owner, nn_count = ring_knn(
        smap, jax.lax.stop_gradient(pts), opts.nn_num, rq,
        opts.table_size, opts.max_per_cell, n_shards)
    both = ring_fetch(smap, I, owner, n_shards)
    return decode_neighbors(params, pts, key, opts, stage, D, both,
                            nn_count, rq, views_d, exposure_feat)


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
        smap = _local(smap_st)
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        return ring_eval_points(smap, params, pts, key, opts, stage, n)

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


# ===========================================================================
# Session-level API: everything slam.py needs to run the WHOLE SLAM loop
# against a cell-sharded map (config flag parallel.map_shard). Hot paths
# (tracking, mapping optimization, point insertion) run sharded; cold paths
# (segment close, final eval, checkpoints) gather to host via gather_host /
# scatter_from_host. Reference n/a (the reference's map is a single-GPU
# faiss index, SURVEY.md §2.4) — this is the TPU capacity-scaling design.
# ===========================================================================


def make_shard_add_candidates(mesh: Mesh, mopts):
    """Sharded surface-point insertion with the GLOBAL zero-neighbor gate.

    Parity with point_cloud.add_points (reference add_neural_points,
    neural_point.py:1557-1631): candidates are gated on having no existing
    neighbor within r_add on ANY shard (ring k=1 pass), each gated location
    spawns N_add stratified points along its ray, and every spawned point
    is inserted on the shard owning its cell. All inputs are replicated;
    the gate is identical on every shard (nn==0 is order-independent), so
    it returns replicated for the host's input-cloud update.

    Returns step(smap, rays_o, rays_d, d, key, valid, r_add(A,))
      -> (smap', n_locations, gate).
    """
    n = mesh.devices.size

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(SMAP_SPEC, P(), P(), P(), P(), P(), P()),
             out_specs=(SMAP_SPEC, P(), P()),
             check_vma=False)
    def _ins(smap_st, rays_o, rays_d, d, key, valid, r_add):
        s = _local(smap_st)
        me = jax.lax.axis_index(AXIS)
        valid = valid & (d > 0)
        pts_gt = rays_o + rays_d * d[:, None]
        _, _, _, nn = ring_knn(s, pts_gt, 1, r_add, mopts.table_size,
                               mopts.max_per_cell, n)
        gate0 = valid & (nn == 0)
        A = pts_gt.shape[0]

        if mopts.fix_interval_when_add_along_ray:
            z = d[:, None] + jnp.linspace(-0.04, 0.04, mopts.N_add)
        else:
            t = jnp.linspace(0.0, 1.0, mopts.N_add)
            dd = d[:, None]
            z = (mopts.near_end_surface * dd * (1.0 - t)
                 + mopts.far_end_surface * dd * t)
        new_pts = (rays_o[:, None, :]
                   + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)
        # full-cell gate over EVERY spawned point's cell (see
        # point_cloud.add_points — the round-3 per-point form): the OWNER
        # shard's hash-row fill decides; psum broadcasts it (non-owners
        # add 0) and the rank computation is replica-deterministic, so the
        # gate stays replica-identical
        M = s.grid.cell_data.shape[1]
        AN = A * mopts.N_add
        cell_h3 = knn._hash_cells(
            knn._cell_of(new_pts, s.grid.cell_size), mopts.table_size)
        own3 = owner_of_points(new_pts, mopts.cell_size, n) == me
        fill3 = jax.lax.psum(
            jnp.where(own3, s.grid.cell_fill[cell_h3], 0), AXIS)
        key_h = jnp.where(jnp.repeat(gate0, mopts.N_add), cell_h3,
                          jnp.int32(mopts.table_size))
        h_order = jnp.argsort(key_h).astype(jnp.int32)
        cs = key_h[h_order]
        first = jnp.searchsorted(cs, cs, side="left").astype(jnp.int32)
        rank_sorted = jnp.arange(AN, dtype=jnp.int32) - first
        cell_rank = jnp.zeros(AN, jnp.int32).at[h_order].set(rank_sorted)
        fits = (fill3 + cell_rank < M).reshape(A, mopts.N_add)
        gate = gate0 & jnp.all(fits, axis=1)
        vflat = jnp.repeat(gate, mopts.N_add)
        mine = vflat & own3

        cap_l = s.pos.shape[0]
        rank = jnp.cumsum(mine.astype(jnp.int32)) - 1
        dest = s.count + rank
        ok = mine & (dest < cap_l)
        dest = jnp.where(ok, dest, cap_l)
        pos = s.pos.at[dest].set(new_pts, mode="drop")
        # the SAME key on every shard -> identical feature draws; each
        # shard keeps the rows it owns (values differ from the single-chip
        # insertion order, which is fine: they are N(0, 0.1) init)
        feat_init = 0.1 * jax.random.normal(
            key, (new_pts.shape[0], 2 * mopts.c_dim))
        feat = s.feat.at[dest].set(feat_init, mode="drop")
        count = s.count + jnp.sum(ok).astype(jnp.int32)
        grid = knn.insert(s.grid, mopts.table_size, new_pts, dest, ok)
        n_loc = jnp.sum(gate).astype(jnp.int32)
        return (_stack(ShardedMap(pos=pos, feat=feat, count=count,
                                  grid=grid)), n_loc, gate)

    return jax.jit(_ins)


def _strip_feat(tree):
    return {**tree, "feat": tree["feat"][0]}


def _stack_feat(tree):
    return {**tree, "feat": tree["feat"][None]}


def make_map_shard_optimize(mesh: Mesh, mopts, ropts, pix_per_frame: int,
                            use_dynamic_radius: bool = False,
                            with_exposure: bool = False,
                            with_ba: bool = False):
    """The staged mapping optimizer over the SHARDED map: rays data-parallel
    (each shard samples its own rays), sample decode via ring k-NN/fetch,
    decoder/exposure gradients psummed, feature gradients local (the ring
    fetch VJP already lands each shard's own rows). Mirrors
    sharded.make_sharded_optimize_map's role for the replicated-map path.

    step(trainable, adam_state, dec_mask, feat_mask, pos, count, grid,
         kf_color, kf_depth, kf_c2w, kf_rq, key, n_geo, n_col, lrs_geo,
         lrs_col, kf_exposure[, ba_row_mask, ba_lr, ba_window,
         iter_offset]) -> (trainable, adam_state, aux)
    where trainable["feat"] / feat_mask / pos / count / grid are the
    stacked sharded arrays and everything else is replicated. With
    with_ba, trainable["cams"] (replicated window-pose 7-vectors) trains
    under the reference's iteration-window schedule — pose gradients ride
    the same psum as the decoder's, so the replicated update is identical
    on every shard.
    """
    from ..mapping.mapper import _optimize_map_impl
    from ..ops.adam import AdamState

    n = mesh.devices.size
    local_pix = max(pix_per_frame // n, 1)

    t_spec = {"dec": P(), "feat": P(AXIS)}
    if with_exposure:
        t_spec["exp"] = P()
    if with_ba:
        t_spec["cams"] = P()
    adam_spec = AdamState(m=t_spec, v=t_spec, step=P())
    in_specs = (t_spec, adam_spec, P(), P(AXIS), P(AXIS), P(AXIS),
                GRID_SPEC, P(), P(), P(), P(), P(), P(), P(), P(), P(), P())
    if with_ba:
        in_specs = in_specs + (P(), P(), P(), P())
    out_specs = (t_spec, adam_spec, P())

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def _opt(trainable, st, dec_mask, feat_mask, pos, count, grid,
             kf_color, kf_depth, kf_c2w, kf_rq, key, n_geo, n_col,
             lrs_geo, lrs_col, kf_exposure, *ba_args):
        trainable = _strip_feat(trainable)
        st = AdamState(m=_strip_feat(st.m), v=_strip_feat(st.v),
                       step=st.step)
        pos_l, count_l = pos[0], count[0]
        grid_l = jax.tree.map(lambda x: x[0], grid)
        feat_mask_l = feat_mask[0]
        ba_row_mask, ba_lr, ba_window, iter_offset = (
            ba_args if with_ba else (None, None, None, None))
        # NOTE: per-iteration keys are decorrelated inside
        # _optimize_map_impl (it folds the axis index when psum_axis is
        # set), so the entry key stays replicated here.

        def eval_fn_builder(params, feats):
            smap_l = ShardedMap(pos=pos_l, feat=feats, count=count_l,
                                grid=grid_l)

            def eval_fn(pts, k, stage, views_d, rq, exposure_feat):
                return ring_eval_points(smap_l, params, pts, k, ropts,
                                        stage, n, views_d, rq,
                                        exposure_feat)

            if ropts.sample_near_pcl:
                # global occupancy probe for zero-depth rays: each shard's
                # probe batch rides the same ring as the k-NN (the batches
                # are per-shard, so a plain psum would OR DIFFERENT point
                # sets — the ring rotates each batch past every shard)
                def probe_occupied(pts):
                    _, _, _, nn = ring_knn(
                        smap_l, pts, 1, ropts.radius_query,
                        ropts.table_size, ropts.max_per_cell, n)
                    return nn > 0

                eval_fn.probe_occupied = probe_occupied
            return eval_fn

        trainable, st, aux = _optimize_map_impl(
            trainable, st, dec_mask, feat_mask_l, pos_l, grid_l,
            kf_color, kf_depth, kf_c2w, kf_rq, key, n_geo, n_col,
            lrs_geo, lrs_col, mopts, ropts, local_pix,
            use_dynamic_radius, kf_exposure,
            ba_row_mask=ba_row_mask, ba_lr=ba_lr, ba_window=ba_window,
            iter_offset=iter_offset, psum_axis=AXIS,
            eval_fn_builder=eval_fn_builder, feat_grad_local=True)
        st = AdamState(m=_stack_feat(st.m), v=_stack_feat(st.v),
                       step=st.step)
        return _stack_feat(trainable), st, aux

    return jax.jit(_opt, donate_argnames=("trainable", "st"))


def make_map_shard_track(mesh: Mesh, topts, ropts,
                         use_selected: bool = False, has_rq: bool = False,
                         has_exposure: bool = False):
    """Per-frame pose optimization over the sharded map: pixels
    data-parallel (each shard renders topts.pixels / n of them), sample
    decode via ring k-NN/fetch, pose/exposure gradients psummed so the
    replicated Adam update is identical everywhere. Wraps
    mapping.tracker._track_frame_impl.

    step(params, smap, color, depth, cam7, key, health[, sel_i, sel_j]
         [, r_query][, exposure_feat]) with the flags choosing the
    optional inputs.
    """
    from ..mapping.tracker import _track_frame_impl

    n = mesh.devices.size
    topts_l = topts._replace(pixels=max(topts.pixels // n, 1))
    n_extra = 2 * use_selected + has_rq + has_exposure
    in_specs = (P(), SMAP_SPEC, P(), P(), P(), P(), P()) + (P(),) * n_extra

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P(),) * 7, check_vma=False)
    def _track(params, smap_st, color, depth, cam7, key, health, *rest):
        s = _local(smap_st)
        i = 0
        sel_i = sel_j = rq = ef = None
        if use_selected:
            sel_i, sel_j = rest[0], rest[1]
            i = 2
        if has_rq:
            rq = rest[i]
            i += 1
        if has_exposure:
            ef = rest[i]

        def eval_fn_builder(params_, feats_):
            smap_l = ShardedMap(pos=s.pos, feat=feats_, count=s.count,
                                grid=s.grid)

            def eval_fn(pts, k, stage, views_d, rq_, exposure_feat):
                return ring_eval_points(smap_l, params_, pts, k, ropts,
                                        stage, n, views_d, rq_,
                                        exposure_feat)

            if ropts.sample_near_pcl:
                def probe_occupied(pts):
                    _, _, _, nn = ring_knn(
                        smap_l, pts, 1, ropts.radius_query,
                        ropts.table_size, ropts.max_per_cell, n)
                    return nn > 0

                eval_fn.probe_occupied = probe_occupied
            return eval_fn

        return _track_frame_impl(
            params, s.pos, s.grid, s.feat, color, depth, cam7, key,
            topts_l, ropts, sel_i, sel_j, rq, use_selected, ef,
            psum_axis=AXIS, eval_fn_builder=eval_fn_builder, health=health)

    return jax.jit(_track)


def make_shard_transform(mesh: Mesh, mopts):
    """Rigid SE(3) transform of every shard's points + local index rebuild
    (the PGO correction applied to the active segment, slam.py)."""

    @partial(jax.shard_map, mesh=mesh, in_specs=(SMAP_SPEC, P()),
             out_specs=SMAP_SPEC, check_vma=False)
    def _tf(smap_st, N):
        s = _local(smap_st)
        pos = s.pos @ N[:3, :3].T + N[:3, 3]
        grid = knn.build(pos, jnp.arange(pos.shape[0]) < s.count,
                         mopts.cell_size, mopts.table_size,
                         mopts.max_per_cell)
        return _stack(s._replace(pos=pos, grid=grid))

    return jax.jit(_tf)


def grow_sharded(mesh: Mesh, smap: ShardedMap, new_cap_l: int, mopts):
    """Return a copy of the sharded map with a larger per-shard capacity
    (capacity-doubling growth policy, slam._maybe_grow_capacity)."""

    @partial(jax.shard_map, mesh=mesh, in_specs=(SMAP_SPEC,),
             out_specs=SMAP_SPEC, check_vma=False)
    def _grow(smap_st):
        s = _local(smap_st)
        cap_l = s.pos.shape[0]
        pos = jnp.zeros((new_cap_l, 3), jnp.float32).at[:cap_l].set(s.pos)
        feat = jnp.zeros((new_cap_l, s.feat.shape[1]),
                         jnp.float32).at[:cap_l].set(s.feat)
        grid = knn.build(pos, jnp.arange(new_cap_l) < s.count,
                         mopts.cell_size, mopts.table_size,
                         mopts.max_per_cell)
        return _stack(ShardedMap(pos=pos, feat=feat, count=s.count,
                                 grid=grid))

    return jax.jit(_grow)(smap)


def owner_of_points_np(pts, cell_size, n_shards: int):
    """Host mirror of owner_of_points (numpy int32 wraparound semantics
    match the device hash exactly)."""
    ijk = np.floor(np.asarray(pts) / cell_size).astype(np.int32)
    with np.errstate(over="ignore"):
        h = ((ijk[:, 0] * np.int32(92837111))
             ^ (ijk[:, 1] * np.int32(689287499))
             ^ (ijk[:, 2] * np.int32(283923481)))
    return h & np.int32(n_shards - 1)


def gather_host(smap: ShardedMap):
    """Concatenate every shard's valid prefix on the host.
    Returns (pos (N,3) f32, feat (N,2c) f32, per-shard counts)."""
    pos = np.asarray(smap.pos)
    feat = np.asarray(smap.feat)
    counts = np.asarray(smap.count)
    p = np.concatenate([pos[s, :counts[s]] for s in range(len(counts))]
                       or [np.zeros((0, 3), np.float32)])
    f = np.concatenate([feat[s, :counts[s]] for s in range(len(counts))]
                       or [np.zeros((0, feat.shape[-1]), np.float32)])
    return p, f, counts


def make_shard_rebuild(mesh: Mesh, mopts):
    """Stacked (pos, count) -> stacked grid (index rebuild per shard)."""

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
             out_specs=GRID_SPEC, check_vma=False)
    def _rebuild(pos_st, count_st):
        pos, count = pos_st[0], count_st[0]
        grid = knn.build(pos, jnp.arange(pos.shape[0]) < count,
                         mopts.cell_size, mopts.table_size,
                         mopts.max_per_cell)
        return jax.tree.map(lambda x: x[None], grid)

    return jax.jit(_rebuild)


def scatter_from_host(mesh: Mesh, pos_np, feat_np, cap_local: int, mopts):
    """Partition host points by cell owner and build a fresh sharded map
    (segment carry-over seeding and checkpoint restore)."""
    n = mesh.devices.size
    c2 = 2 * mopts.c_dim
    owners = owner_of_points_np(pos_np, mopts.cell_size, n)
    pos = np.zeros((n, cap_local, 3), np.float32)
    feat = np.zeros((n, cap_local, c2), np.float32)
    counts = np.zeros((n,), np.int32)
    for s in range(n):
        rows = owners == s
        cnt = int(rows.sum())
        if cnt > cap_local:
            raise ValueError(
                f"shard {s} needs {cnt} rows > per-shard capacity "
                f"{cap_local}; increase pointcloud capacity")
        pos[s, :cnt] = pos_np[rows]
        feat[s, :cnt] = feat_np[rows]
        counts[s] = cnt
    sh = NamedSharding(mesh, P(AXIS))
    pos_d = jax.device_put(pos, sh)
    feat_d = jax.device_put(feat, sh)
    count_d = jax.device_put(counts, sh)
    grid = make_shard_rebuild(mesh, mopts)(pos_d, count_d)
    return ShardedMap(pos=pos_d, feat=feat_d, count=count_d, grid=grid)


def make_shard_frustum_mask(mesh: Mesh, opts):
    """Per-shard frustum feature-selection mask over local points
    (mapper.frustum_feature_mask semantics, replicated camera inputs)."""
    from ..mapping.mapper import frustum_feature_mask

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(AXIS), P(), P()),
             out_specs=P(AXIS), check_vma=False)
    def _mask(pos_st, count_st, c2w, depth):
        m = frustum_feature_mask(pos_st[0], count_st[0], c2w, depth, opts)
        return m[None]

    return jax.jit(_mask)
