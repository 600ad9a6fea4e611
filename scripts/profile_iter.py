#!/usr/bin/env python
"""Microbenchmark the mapping-iteration hot path on the attached device.

Times each stage of the render+backward iteration in isolation so kernel
work targets the real bottleneck:
  - knn.query (candidate row gather + top-k)
  - feature gather feats[I]
  - scatter-add backward of the feature gather
  - decoder forward (geo+color MLPs, neighbor transform)
  - full _map_loss value_and_grad
  - full optimize_map chunk per-iteration cost
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loopy_slam_tpu.config import DEFAULTS
from loopy_slam_tpu.mapping.point_cloud import MapOptions, init_map, add_points
from loopy_slam_tpu.mapping import mapper as mapper_mod
from loopy_slam_tpu.models.decoder import init_decoders, trainable_mask
from loopy_slam_tpu.models.renderer import RenderOptions
from loopy_slam_tpu.ops import adam as adam_mod
from loopy_slam_tpu.ops import knn


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import copy
    cfg = copy.deepcopy(DEFAULTS)
    print("devices:", jax.devices())

    Q = 25_000          # 5000 px x 5 samples
    CAP = 2 ** 17       # typical live buffer
    NPTS = 100_000
    c_dim = cfg["model"]["c_dim"]
    mopts = MapOptions.from_cfg(cfg)._replace(capacity=CAP)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # synthetic map: points in a 4m cube
    pts = jax.random.uniform(k1, (CAP, 3), jnp.float32, 0.0, 4.0)
    valid = jnp.arange(CAP) < NPTS
    grid = knn.build(pts, valid, mopts.cell_size, mopts.table_size,
                     mopts.max_per_cell)
    feats = jax.random.normal(k2, (CAP, 2 * c_dim), jnp.float32) * 0.1
    # queries near points (realistic: samples cluster at surfaces)
    qidx = jax.random.randint(k3, (Q,), 0, NPTS)
    queries = pts[qidx] + jax.random.normal(key, (Q, 3)) * 0.02

    radius = cfg["pointcloud"]["radius_query"]

    @jax.jit
    def q_only(grid, pts, queries):
        return knn.query(grid, pts, queries, 8, radius, mopts.table_size,
                         mopts.max_per_cell, return_pos=True)

    t = timeit(q_only, grid, pts, queries)
    print(f"knn.query           : {t*1e3:8.3f} ms  ({Q/t/1e6:.1f} Mq/s)")

    D, I, nn, npos = q_only(grid, pts, queries)
    jax.block_until_ready(I)

    @jax.jit
    def gather_only(feats, I):
        return feats[I]

    t = timeit(gather_only, feats, I)
    print(f"feats[I] gather     : {t*1e3:8.3f} ms")

    g = jax.random.normal(key, (Q, 8, 2 * c_dim))

    @jax.jit
    def scatter_add(I, g):
        return jnp.zeros((CAP, 2 * c_dim)).at[I].add(g)

    t = timeit(scatter_add, I, g)
    print(f"scatter-add backward: {t*1e3:8.3f} ms")

    # decoders
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    ropts = RenderOptions.from_cfg(cfg)

    from loopy_slam_tpu.models.renderer import eval_points

    @jax.jit
    def fwd(params, pts, grid, feats, queries):
        return eval_points(params, pts, grid, feats, queries,
                           jax.random.PRNGKey(2), ropts, "color")

    t = timeit(fwd, params, pts, grid, feats, queries)
    print(f"eval_points fwd     : {t*1e3:8.3f} ms")

    @jax.jit
    def fwd_bwd(params, pts, grid, feats, queries):
        def loss(f, q):
            occ, rgb, hn = eval_points(params, pts, grid, f, q,
                                       jax.random.PRNGKey(2), ropts, "color")
            return jnp.sum(occ) + jnp.sum(rgb)
        return jax.grad(loss, argnums=(0, 1))(feats, queries)

    t = timeit(fwd_bwd, params, pts, grid, feats, queries)
    print(f"eval_points fwd+bwd : {t*1e3:8.3f} ms")

    # full mapping iteration (optimize_map with 10 iters, measure /iter)
    H, W = 340, 600
    F = 5
    pix = 5000 // F
    kf_color = jax.random.uniform(key, (F, H, W, 3))
    kf_depth = jax.random.uniform(key, (F, H, W), jnp.float32, 1.0, 3.0)
    kf_c2w = jnp.broadcast_to(jnp.eye(4)[:3], (F, 3, 4)) + 0.0
    mapopts = mapper_mod.MapperOptions.from_cfg(cfg)._replace(
        H=H, W=W, fx=300.0, fy=300.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    dmask = trainable_mask(params, cfg)
    fmask = valid
    trainable = {"dec": params, "feat": feats}
    lrs = jnp.asarray([1e-3, 1e-3, 1e-3])

    def run_chunk(trainable, n_iters):
        st = adam_mod.init(trainable)
        out = mapper_mod.optimize_map(
            trainable, st, dmask, fmask, pts, grid, kf_color, kf_depth,
            kf_c2w, None, jax.random.PRNGKey(3), jnp.asarray(0),
            jnp.asarray(n_iters), lrs, lrs, mapopts, ropts, pix)
        return out[0]["feat"]

    for n in (1, 10):
        t = timeit(run_chunk, trainable, n, n=5, warmup=2)
        print(f"optimize_map n={n:3d}  : {t*1e3:8.3f} ms  "
              f"({t/n*1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
