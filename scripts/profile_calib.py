#!/usr/bin/env python
"""Calibrate device timing on the axon backend.

block_until_ready does NOT reliably wait on this remote backend, and the
dispatch+fetch round trip is ~39 ms. Every measurement chains each call's
output into the next call's input (so calls pipeline but must all execute)
and ends with ONE host fetch; per-call time = (wall - 1 rtt) / N.

All arrays are threaded as jit ARGUMENTS: closure constants are serialized
into the remote-compile request and blow its size limit.
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
from loopy_slam_tpu.mapping.point_cloud import MapOptions
from loopy_slam_tpu.ops import knn

N = 20


def fetch(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def chain_time(label, step, state, args, rtt, extra_of=None):
    """step(carry, *args) -> carry. Times N chained calls + final fetch."""
    state = step(state, *args)
    fetch(state)
    t0 = time.perf_counter()
    for _ in range(N):
        state = step(state, *args)
    fetch(state)
    dt = (time.perf_counter() - t0 - rtt) / N
    extra = extra_of(dt) if extra_of else ""
    print(f"{label:30s}: {dt*1e3:9.3f} ms  {extra}", flush=True)
    return dt


def main():
    import copy
    cfg = copy.deepcopy(DEFAULTS)
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(())

    f_triv = jax.jit(lambda b: b * 1.000001 + 1e-9)
    x = f_triv(x0)
    fetch(x)
    t0 = time.perf_counter()
    for _ in range(N):
        x = f_triv(x)
        fetch(x)
    rtt = (time.perf_counter() - t0) / N
    print(f"{'dispatch+fetch round trip':30s}: {rtt*1e3:9.3f} ms", flush=True)

    big = jax.random.normal(key, (64 * 1024 * 1024,), jnp.float32)
    f_sum = jax.jit(
        lambda b, big: jnp.sum(big) * 1e-12 + b * 1.000001)
    chain_time("sum 256MB", f_sum, x0, (big,), rtt,
               lambda dt: f"-> {0.25/dt:.0f} GB/s read")

    Q, CAP, NPTS = 25_000, 2 ** 17, 100_000
    mopts = MapOptions.from_cfg(cfg)._replace(capacity=CAP)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (CAP, 3), jnp.float32, 0.0, 4.0)
    valid = jnp.arange(CAP) < NPTS
    grid = knn.build(pts, valid, mopts.cell_size, mopts.table_size,
                     mopts.max_per_cell)
    radius = cfg["pointcloud"]["radius_query"]
    qidx = jax.random.randint(k2, (Q,), 0, NPTS)
    qbase = pts[qidx] + jax.random.normal(k2, (Q, 3)) * 0.02

    @jax.jit
    def f_knn(carry, grid, pts, qbase):
        q = qbase + carry * 1e-7
        D, I, nn, pos = knn.query(grid, pts, q, 8, radius,
                                  mopts.table_size, mopts.max_per_cell,
                                  return_pos=True)
        return jnp.sum(D * 1e-20) + carry * 1.000001

    chain_time("knn.query 25k", f_knn, x0, (grid, pts, qbase), rtt,
               lambda dt: f"-> {Q*27*256/dt/1e9:.0f} GB/s rows, "
                          f"{Q/dt/1e6:.1f} Mq/s")

    feats = jax.random.normal(key, (CAP, 64), jnp.float32) * 0.1
    I0 = jax.random.randint(key, (Q, 8), 0, NPTS)

    @jax.jit
    def f_gather(carry, feats, I0):
        g = feats[I0] + carry * 1e-9
        return jnp.sum(g) * 1e-12 + carry * 1.000001

    chain_time("feats[(25k,8)] gather", f_gather, x0, (feats, I0), rtt,
               lambda dt: f"-> {Q*8*256/dt/1e9:.0f} GB/s")

    @jax.jit
    def f_scatter(carry, I0):
        g = jnp.ones((Q, 8, 64)) * (1.0 + carry * 1e-9)
        out = jnp.zeros((CAP, 64)).at[I0].add(g)
        return jnp.sum(out) * 1e-12 + carry * 1.000001

    chain_time("scatter-add (25k,8) rows", f_scatter, x0, (I0,), rtt)

    @jax.jit
    def f_build(carry, pts, valid):
        g = knn.build(pts + carry * 1e-9, valid, mopts.cell_size,
                      mopts.table_size, mopts.max_per_cell)
        return jnp.sum(g.cell_data[0]) * 1e-12 + carry * 1.000001

    chain_time("knn.build (2^17 cap)", f_build, x0, (pts, valid), rtt)

    d2 = jax.random.uniform(key, (Q, 432))

    @jax.jit
    def f_topk(carry, d2):
        neg, idx = jax.lax.top_k(-(d2 + carry * 1e-9), 8)
        return jnp.sum(neg) * 1e-12 + carry * 1.000001

    chain_time("top_k 432->8 on 25k", f_topk, x0, (d2,), rtt)

    # one full render fwd+bwd (the _map_loss core without sampling)
    from loopy_slam_tpu.models.decoder import init_decoders
    from loopy_slam_tpu.models.renderer import RenderOptions, eval_points
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    ropts = RenderOptions.from_cfg(cfg)
    feats2 = jax.random.normal(key, (CAP, 64), jnp.float32) * 0.1

    @jax.jit
    def f_fwd_bwd(carry, params, pts, grid, feats, qbase):
        def loss(f, q):
            occ, rgb, hn = eval_points(params, pts, grid, f, q,
                                       jax.random.PRNGKey(2), ropts, "color")
            return jnp.sum(occ) * 1e-9 + jnp.sum(rgb) * 1e-9
        gf, gq = jax.grad(loss, argnums=(0, 1))(
            feats + carry * 1e-12, qbase + carry * 1e-9)
        return jnp.sum(gf) * 1e-12 + carry * 1.000001

    chain_time("eval_points fwd+bwd 25k", f_fwd_bwd, x0,
               (params, pts, grid, feats2, qbase), rtt)

    @jax.jit
    def f_fwd(carry, params, pts, grid, feats, qbase):
        occ, rgb, hn = eval_points(params, pts, grid, feats,
                                   qbase + carry * 1e-9,
                                   jax.random.PRNGKey(2), ropts, "color")
        return jnp.sum(occ) * 1e-12 + carry * 1.000001

    chain_time("eval_points fwd 25k", f_fwd, x0,
               (params, pts, grid, feats2, qbase), rtt)


if __name__ == "__main__":
    main()
