#!/usr/bin/env python
"""Measure host->device upload cost vs size, eager-op dispatch cost, and
the cost of adam.init-style zeros_like trees on the axon backend."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 10


def main():
    print("devices:", jax.devices(), flush=True)

    # upload cost: put_device + use in a trivial jitted op + fetch
    f = jax.jit(lambda x: x.ravel()[0] * 1.000001)
    for sz in (8, 1024, 256 * 1024, 2 ** 20 * 3, 2 ** 23):
        host = [np.full((sz // 4,), i, np.float32) for i in range(N)]
        x = jnp.asarray(host[0]); float(np.asarray(f(x)))
        t0 = time.perf_counter()
        for i in range(N):
            x = jnp.asarray(host[i])
        y = f(x)
        float(np.asarray(y))
        dt = (time.perf_counter() - t0) / N
        print(f"upload {sz/1024:10.0f} KiB: {dt*1e3:9.2f} ms "
              f"({sz/dt/1e6:.0f} MB/s)", flush=True)

    # eager-op dispatch cost: zeros_like chain (like adam.init over a tree)
    leaves = [jnp.ones((128, 128)) for _ in range(30)]
    t0 = time.perf_counter()
    for _ in range(N):
        z = [jnp.zeros_like(l) for l in leaves]
    float(np.asarray(z[0][0, 0]))
    dt = (time.perf_counter() - t0) / N
    print(f"30-leaf zeros_like (eager): {dt*1e3:9.2f} ms", flush=True)

    # jitted zeros tree
    g = jax.jit(lambda ls: [jnp.zeros_like(l) for l in ls])
    z = g(leaves); float(np.asarray(z[0][0, 0]))
    t0 = time.perf_counter()
    for _ in range(N):
        z = g(leaves)
    float(np.asarray(z[0][0, 0]))
    dt = (time.perf_counter() - t0) / N
    print(f"30-leaf zeros_like (jitted): {dt*1e3:9.2f} ms", flush=True)

    # dispatch cost of a jitted program with MANY small args
    many = [jnp.ones((8,)) * i for i in range(40)]
    h = jax.jit(lambda *xs: sum(x[0] for x in xs))
    y = h(*many); float(np.asarray(y))
    t0 = time.perf_counter()
    for _ in range(N):
        y = h(*many)
    float(np.asarray(y))
    dt = (time.perf_counter() - t0) / N
    print(f"jitted call, 40 small args: {dt*1e3:9.2f} ms", flush=True)

    # PRNG split chain (tracker/mapper do this every frame)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for _ in range(N):
        key, k2 = jax.random.split(key)
    float(np.asarray(k2[0]))
    dt = (time.perf_counter() - t0) / N
    print(f"jax.random.split (eager): {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
