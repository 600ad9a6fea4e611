#!/usr/bin/env python
"""Measure optimize_map per-call overhead vs per-iteration cost, with and
without buffer donation, chained exactly like slam.map_frame chains chunks.
Fits wall(J) = overhead_per_call + J * per_iter."""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from loopy_slam_tpu.config import DEFAULTS
from loopy_slam_tpu.mapping.point_cloud import MapOptions
from loopy_slam_tpu.mapping import mapper as mapper_mod
from loopy_slam_tpu.models.decoder import init_decoders, trainable_mask
from loopy_slam_tpu.models.renderer import RenderOptions
from loopy_slam_tpu.ops import adam as adam_mod
from loopy_slam_tpu.ops import knn


def main():
    import copy
    cfg = copy.deepcopy(DEFAULTS)
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    Q, CAP, NPTS = 25_000, 2 ** 17, 100_000
    mopts = MapOptions.from_cfg(cfg)._replace(capacity=CAP)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (CAP, 3), jnp.float32, 0.0, 4.0)
    valid = jnp.arange(CAP) < NPTS
    grid = knn.build(pts, valid, mopts.cell_size, mopts.table_size,
                     mopts.max_per_cell)
    feats = jax.random.normal(key, (CAP, 64), jnp.float32) * 0.1
    params = init_decoders(jax.random.PRNGKey(1), cfg)
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

    # a non-donating clone of optimize_map
    plain = jax.jit(mapper_mod.optimize_map.__wrapped__,
                    static_argnames=("opts", "ropts", "pix_per_frame",
                                     "use_dynamic_radius"))

    # host copies: donated leaves must be re-uploaded fresh for every run
    params_np = jax.tree.map(np.asarray, params)
    feats_np = np.asarray(feats)

    def run(fn, n_calls, iters_per_call, label):
        trainable = {"dec": jax.tree.map(jnp.asarray, params_np),
                     "feat": jnp.asarray(feats_np)}
        st = adam_mod.init(trainable)
        # warm up compile
        trainable, st, aux = fn(
            trainable, st, dmask, valid, pts, grid, kf_color, kf_depth,
            kf_c2w, None, jax.random.PRNGKey(3), jnp.asarray(0),
            jnp.asarray(iters_per_call), lrs, lrs, mapopts, ropts, pix)
        float(np.asarray(aux[0]))
        trainable = {"dec": jax.tree.map(jnp.asarray, params_np),
                     "feat": jnp.asarray(feats_np)}
        st = adam_mod.init(trainable)
        t0 = time.perf_counter()
        for i in range(n_calls):
            trainable, st, aux = fn(
                trainable, st, dmask, valid, pts, grid, kf_color, kf_depth,
                kf_c2w, None, jax.random.PRNGKey(3 + i), jnp.asarray(0),
                jnp.asarray(iters_per_call), lrs, lrs, mapopts, ropts, pix)
        float(np.asarray(aux[0]))
        dt = time.perf_counter() - t0
        print(f"{label}: {n_calls} calls x {iters_per_call} iters: "
              f"{dt*1e3:9.1f} ms total, {dt/n_calls*1e3:8.1f} ms/call",
              flush=True)
        return dt / n_calls

    for label, fn in (("donated", mapper_mod.optimize_map),
                      ("plain  ", plain)):
        t1 = run(fn, 6, 1, label)
        t20 = run(fn, 6, 20, label)
        per_iter = (t20 - t1) / 19
        overhead = t1 - per_iter
        print(f"  -> {label}: per-iter {per_iter*1e3:.2f} ms, "
              f"per-call overhead {overhead*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
