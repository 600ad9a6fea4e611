#!/usr/bin/env python
"""Decompose the render-iteration cost: gather variants (table size, row
width, fusion), eval_points stage split, and a chained ground-truth
per-iteration measure of optimize_map."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from loopy_slam_tpu.config import DEFAULTS
from loopy_slam_tpu.mapping.point_cloud import MapOptions
from loopy_slam_tpu.ops import knn

N = 20


def fetch(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def chain_time(label, step, state, args, rtt, n=N):
    state = step(state, *args)
    fetch(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state, *args)
    fetch(state)
    dt = (time.perf_counter() - t0 - rtt) / n
    print(f"{label:36s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    import copy
    cfg = copy.deepcopy(DEFAULTS)
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(())

    f_triv = jax.jit(lambda b: b * 1.000001 + 1e-9)
    x = f_triv(x0); fetch(x)
    t0 = time.perf_counter()
    for _ in range(N):
        x = f_triv(x); fetch(x)
    rtt = (time.perf_counter() - t0) / N
    print(f"{'rtt':36s}: {rtt*1e3:9.3f} ms", flush=True)

    Q = 25_000
    R = Q * 27  # stencil rows

    # ---- gather variants: 675k rows of 64 f32 from tables of various sizes
    for logT in (20, 17, 14):
        T = 2 ** logT
        tab = jax.random.normal(key, (T, 64), jnp.float32)
        idx = jax.random.randint(key, (R,), 0, T)

        @jax.jit
        def f_take(carry, tab, idx):
            g = jnp.take(tab, idx, axis=0) + carry * 1e-9
            return jnp.sum(g) * 1e-12 + carry * 1.000001

        chain_time(f"take 675k rows from 2^{logT}x64", f_take, x0,
                   (tab, idx), rtt)

    # sorted indices (coherent access)
    T = 2 ** 20
    tab = jax.random.normal(key, (T, 64), jnp.float32)
    idx_sorted = jnp.sort(jax.random.randint(key, (R,), 0, T))

    @jax.jit
    def f_take_sorted(carry, tab, idx):
        g = jnp.take(tab, idx, axis=0) + carry * 1e-9
        return jnp.sum(g) * 1e-12 + carry * 1.000001

    chain_time("take 675k SORTED rows 2^20x64", f_take_sorted, x0,
               (tab, idx_sorted), rtt)

    # fewer rows: 200k from 2^20
    idx200 = jax.random.randint(key, (200_000,), 0, T)
    chain_time("take 200k rows from 2^20x64", f_take_sorted, x0,
               (tab, idx200), rtt)

    # narrower rows: 675k x 32 lanes
    tab32 = jax.random.normal(key, (T, 32), jnp.float32)
    idx675 = jax.random.randint(key, (R,), 0, T)
    chain_time("take 675k rows from 2^20x32", f_take_sorted, x0,
               (tab32, idx675), rtt)

    # wider rows, fewer of them: 169k x 256 lanes (same bytes as 675k x 64)
    tab256 = jax.random.normal(key, (2 ** 18, 256), jnp.float32)
    idx169 = jax.random.randint(key, (R // 4,), 0, 2 ** 18)
    chain_time("take 169k rows from 2^18x256", f_take_sorted, x0,
               (tab256, idx169), rtt)

    # ---- eval_points stage split at Q=25k ----
    CAP, NPTS = 2 ** 17, 100_000
    mopts = MapOptions.from_cfg(cfg)._replace(capacity=CAP)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (CAP, 3), jnp.float32, 0.0, 4.0)
    valid = jnp.arange(CAP) < NPTS
    grid = knn.build(pts, valid, mopts.cell_size, mopts.table_size,
                     mopts.max_per_cell)
    radius = cfg["pointcloud"]["radius_query"]
    qidx = jax.random.randint(k2, (Q,), 0, NPTS)
    qbase = pts[qidx] + jax.random.normal(k2, (Q, 3)) * 0.02
    feats = jax.random.normal(key, (CAP, 64), jnp.float32) * 0.1

    from loopy_slam_tpu.models.decoder import (
        init_decoders, interp_weights, interpolate_features, geo_forward,
        col_forward, neighbor_transform)
    params = init_decoders(jax.random.PRNGKey(1), cfg)

    @jax.jit
    def f_query(carry, grid, pts, q):
        D, I, nn, pos = knn.query(grid, pts, q + carry * 1e-9, 8, radius,
                                  mopts.table_size, mopts.max_per_cell,
                                  return_pos=True)
        return jnp.sum(D * 1e-20) + carry * 1.000001

    chain_time("knn.query (full)", f_query, x0, (grid, pts, qbase), rtt)

    # query minus top_k: just gather + d2 + reduce-min
    @jax.jit
    def f_query_nok(carry, grid, q):
        q = q + carry * 1e-9
        M = grid.cell_data.shape[1]
        qc = jnp.floor(q / grid.cell_size).astype(jnp.int32)
        cells = qc[:, None, :] + jnp.asarray(knn._OFFSETS27)[None, :, :]
        h = knn._hash_cells(cells, mopts.table_size)
        rows = jnp.take(grid.cell_data.reshape(mopts.table_size + 1, M * 4),
                        h.reshape(-1), axis=0).reshape(Q, 27, M, 4)
        diff = rows[..., :3] - q[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.sum(jnp.min(d2, axis=(1, 2))) * 1e-12 + carry * 1.000001

    chain_time("query: gather+d2+min (no topk)", f_query_nok, x0,
               (grid, qbase), rtt)

    # gather-only: the stencil row fetch with nothing after it
    @jax.jit
    def f_gather_only(carry, grid, q):
        q = q + carry * 1e-9
        M = grid.cell_data.shape[1]
        qc = jnp.floor(q / grid.cell_size).astype(jnp.int32)
        cells = qc[:, None, :] + jnp.asarray(knn._OFFSETS27)[None, :, :]
        h = knn._hash_cells(cells, mopts.table_size)
        rows = jnp.take(grid.cell_data.reshape(mopts.table_size + 1, M * 4),
                        h.reshape(-1), axis=0)
        return jnp.sum(rows) * 1e-20 + carry * 1.000001

    chain_time("query: hash+gather only", f_gather_only, x0,
               (grid, qbase), rtt)

    # select-kernel-only: feed pre-gathered rows straight to _select_topk
    M = grid.cell_data.shape[1]
    qc = jnp.floor(qbase / grid.cell_size).astype(jnp.int32)
    cells = qc[:, None, :] + jnp.asarray(knn._OFFSETS27)[None, :, :]
    h = knn._hash_cells(cells, mopts.table_size)
    rows_pre = jnp.take(grid.cell_data.reshape(mopts.table_size + 1, M * 4),
                        h.reshape(-1), axis=0).reshape(Q, 27 * M * 4)
    q4 = jnp.pad(qbase, ((0, 0), (0, 1)))

    @jax.jit
    def f_kernel_only(carry, rows_pre, q4):
        packed = knn._select_topk(rows_pre + carry * 1e-9, q4, 8)
        return jnp.sum(packed) * 1e-20 + carry * 1.000001

    chain_time("query: select kernel only", f_kernel_only, x0,
               (rows_pre, q4), rtt)

    # dup-mask cost: the tril pairwise hash compare
    @jax.jit
    def f_dupmask(carry, grid, q):
        q = q + carry * 1e-9
        qc = jnp.floor(q / grid.cell_size).astype(jnp.int32)
        cells = qc[:, None, :] + jnp.asarray(knn._OFFSETS27)[None, :, :]
        h = knn._hash_cells(cells, mopts.table_size)
        dup = jnp.tril(h[:, :, None] == h[:, None, :], k=-1).any(axis=-1)
        return jnp.sum(dup) * 1e-12 + carry * 1.000001

    chain_time("query: hash+dupmask only", f_dupmask, x0,
               (grid, qbase), rtt)

    # geo MLP alone
    c_geo = jax.random.normal(key, (Q, 32)) * 0.1

    @jax.jit
    def f_geo(carry, params, q, c):
        occ = geo_forward(params["geo"], q + carry * 1e-9, c)
        return jnp.sum(occ) * 1e-12 + carry * 1.000001

    chain_time("geo MLP fwd 25k", f_geo, x0, (params, qbase, c_geo), rtt)

    # color MLP alone
    @jax.jit
    def f_col(carry, params, q, c):
        rgb = col_forward(params["col"], q + carry * 1e-9, c)
        return jnp.sum(rgb) * 1e-12 + carry * 1.000001

    chain_time("color MLP fwd 25k", f_col, x0, (params, qbase, c_geo), rtt)

    # neighbor transform alone (25k, 8, 32)
    nf = jax.random.normal(key, (Q, 8, 32)) * 0.1
    rel = jax.random.normal(key, (Q, 8, 3)) * 0.05

    @jax.jit
    def f_nt(carry, params, nf, rel):
        out = neighbor_transform(params["col"], nf + carry * 1e-9, rel)
        return jnp.sum(out) * 1e-12 + carry * 1.000001

    chain_time("neighbor_transform fwd 25k x8", f_nt, x0,
               (params, nf, rel), rtt)

    # fwd+bwd variants (grads to params + inputs, like the mapper)
    @jax.jit
    def f_geo_bwd(carry, params, q, c):
        def loss(p, cc):
            return jnp.sum(geo_forward(p["geo"], q + carry * 1e-9, cc))
        g1, g2 = jax.grad(loss, argnums=(0, 1))(params, c)
        return (jax.tree.leaves(g1)[0].ravel()[0] * 1e-12
                + jnp.sum(g2) * 1e-12 + carry * 1.000001)

    chain_time("geo MLP fwd+bwd 25k", f_geo_bwd, x0,
               (params, qbase, c_geo), rtt)

    @jax.jit
    def f_col_bwd(carry, params, q, c):
        def loss(p, cc):
            return jnp.sum(col_forward(p["col"], q + carry * 1e-9, cc))
        g1, g2 = jax.grad(loss, argnums=(0, 1))(params, c)
        return (jax.tree.leaves(g1)[0].ravel()[0] * 1e-12
                + jnp.sum(g2) * 1e-12 + carry * 1.000001)

    chain_time("color MLP fwd+bwd 25k", f_col_bwd, x0,
               (params, qbase, c_geo), rtt)

    @jax.jit
    def f_nt_bwd(carry, params, nf, rel):
        def loss(p, f):
            return jnp.sum(neighbor_transform(p["col"], f + carry * 1e-9,
                                              rel))
        g1, g2 = jax.grad(loss, argnums=(0, 1))(params, nf)
        return (jax.tree.leaves(g1)[0].ravel()[0] * 1e-12
                + jnp.sum(g2) * 1e-12 + carry * 1.000001)

    chain_time("neighbor_transform fwd+bwd", f_nt_bwd, x0,
               (params, nf, rel), rtt)

    # feature gather + scatter-add backward (the feats[I] VJP)
    I_idx = jax.random.randint(key, (Q, 8), 0, NPTS)
    gg = jax.random.normal(key, (Q, 8, 64)) * 0.1

    @jax.jit
    def f_gather_feat(carry, feats, I_idx):
        g = feats[I_idx] + carry * 1e-9
        return jnp.sum(g) * 1e-12 + carry * 1.000001

    chain_time("feats[I] gather (Q,8,64)", f_gather_feat, x0,
               (feats, I_idx), rtt)

    @jax.jit
    def f_scatter(carry, I_idx, gg):
        out = jnp.zeros((CAP, 64)).at[I_idx].add(gg + carry * 1e-9)
        return jnp.sum(out) * 1e-12 + carry * 1.000001

    chain_time("scatter-add (Q,8,64)->cap", f_scatter, x0,
               (I_idx, gg), rtt)

    # ---- ground-truth optimize_map per-iteration (chained) ----
    from loopy_slam_tpu.mapping import mapper as mapper_mod
    from loopy_slam_tpu.models.decoder import trainable_mask
    from loopy_slam_tpu.models.renderer import RenderOptions
    from loopy_slam_tpu.ops import adam as adam_mod
    ropts = RenderOptions.from_cfg(cfg)
    H, W, F = 340, 600, 5
    pix = 5000 // F
    kf_color = jax.random.uniform(key, (F, H, W, 3))
    kf_depth = jax.random.uniform(key, (F, H, W), jnp.float32, 1.0, 3.0)
    kf_c2w = jnp.broadcast_to(jnp.eye(4)[:3], (F, 3, 4)) + 0.0
    mapopts = mapper_mod.MapperOptions.from_cfg(cfg)._replace(
        H=H, W=W, fx=300.0, fy=300.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    dmask = trainable_mask(params, cfg)
    lrs = jnp.asarray([1e-3, 1e-3, 1e-3])

    def step_factory(n_iters):
        def step(carry_trainable, pts, grid, kf_color, kf_depth, kf_c2w):
            st = adam_mod.init(carry_trainable)
            out = mapper_mod.optimize_map(
                carry_trainable, st, dmask, valid, pts, grid, kf_color,
                kf_depth, kf_c2w, None, jax.random.PRNGKey(3),
                jnp.asarray(0), jnp.asarray(n_iters), lrs, lrs, mapopts,
                ropts, pix)
            return out[0]
        return step

    def fresh_trainable():
        # optimize_map DONATES its trainable arg: reusing the original
        # handles after a chain poisons the buffers ("TPU backend error");
        # deep-copy the leaves for every chain
        return jax.tree.map(lambda x: x + 0.0, {"dec": params, "feat": feats})

    t1 = chain_time("optimize_map 1 iter (chained)",
                    step_factory(1), fresh_trainable(),
                    (pts, grid, kf_color, kf_depth, kf_c2w), rtt, n=6)
    t5 = chain_time("optimize_map 5 iters (chained)",
                    step_factory(5), fresh_trainable(),
                    (pts, grid, kf_color, kf_depth, kf_c2w), rtt, n=6)
    print(f"  -> marginal per-iter: {(t5-t1)/4*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
