"""query_chunked must return exactly query()'s results while bounding
the stencil-gather temp (the TUM frame-267 compile OOM: 100k unchunked
queries against an M=256 escalated grid materialized 10.3 GB)."""

import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.ops import knn


def test_query_chunked_matches_unchunked():
    rng = np.random.default_rng(5)
    cell, M, T = 0.1, 16, 2 ** 12
    pts = jnp.asarray(rng.uniform(0, 1.0, (3000, 3)).astype(np.float32))
    valid = jnp.ones(len(pts), bool)
    g = knn.build(pts, valid, cell, T, M)
    q = jnp.asarray(rng.uniform(0, 1.0, (1000, 3)).astype(np.float32))

    for radius in (0.05, jnp.asarray(
            rng.uniform(0.02, 0.09, 1000).astype(np.float32))):
        D0, I0, n0 = knn.query(g, pts, q, 8, radius, T, M)
        # chunk size forces padding (1000 -> 4 chunks of 300)
        D1, I1, n1 = knn.query_chunked(g, pts, q, 8, radius, T, M,
                                       chunk=300)
        np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))
        np.testing.assert_array_equal(np.asarray(D0), np.asarray(D1))
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))

    # the small-Q fast path (no lax.map) is also exact
    D2, I2, n2 = knn.query_chunked(g, pts, q, 8, 0.05, T, M, chunk=4096)
    D0, I0, n0 = knn.query(g, pts, q, 8, 0.05, T, M)
    np.testing.assert_array_equal(np.asarray(I0), np.asarray(I2))
