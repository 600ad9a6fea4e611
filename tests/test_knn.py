import jax
import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.ops import knn

TABLE = 2 ** 16


def build_random(rng, n=500, cap=1024, cell=0.4):
    pts = rng.uniform(-1.0, 1.0, size=(cap, 3)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n] = True
    # 32 slots: at this density the default 16 can overflow a hash-merged
    # row (exactness holds only for indexed points; grid.n_dropped counts
    # the rest, asserted zero below)
    grid = knn.build(jnp.asarray(pts), jnp.asarray(valid), cell, TABLE,
                     max_per_cell=32)
    return pts, valid, grid


def test_knn_matches_brute_force(rng):
    cell = 0.4  # exactness contract: query radius <= cell
    pts, valid, grid = build_random(rng, cell=cell)
    q = rng.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32)
    # the production operating point (MapOptions.from_cfg sets
    # cell_size = radius_query): the 27-cell stencil must be exact at
    # r == cell, not just r == cell/2
    r = cell
    assert int(grid.n_dropped) == 0  # exactness contract's precondition
    D, I, nn = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                         r, TABLE, max_per_cell=64)
    Db, Ib = knn.brute_force_knn(jnp.asarray(pts), jnp.asarray(valid),
                                 jnp.asarray(q), 8)
    D, Db = np.asarray(D), np.asarray(Db)
    nn = np.asarray(nn)
    r2 = r ** 2
    # within the radius the hash-grid result must equal exact k-NN
    for qi in range(q.shape[0]):
        exact_in = np.sort(Db[qi][Db[qi] < r2])
        ours_in = np.sort(D[qi][D[qi] < r2])
        assert len(ours_in) == len(exact_in) == nn[qi]
        # kernel D clears 11 low mantissa bits (<= 2^-12 relative)
        np.testing.assert_allclose(ours_in, exact_in, rtol=3e-4)


def test_knn_distances_sorted_and_indices_consistent(rng):
    pts, valid, grid = build_random(rng)
    q = rng.uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32)
    D, I, nn = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                         0.2, TABLE, max_per_cell=64)
    D, I = np.asarray(D), np.asarray(I)
    assert (np.diff(D, axis=-1) >= -1e-6).all()
    # D must equal the true squared distance of the returned index
    for qi in range(q.shape[0]):
        for k in range(8):
            if D[qi, k] < 1e9:
                d2 = np.sum((pts[I[qi, k]] - q[qi]) ** 2)
                # quantized-UP D: within 2^-12 relative, never below —
                # D is an upper bound so radius tests never over-count
                np.testing.assert_allclose(D[qi, k], d2, rtol=3e-4)
                assert D[qi, k] >= d2 * (1 - 1e-6)


def test_knn_no_duplicate_neighbors(rng):
    pts, valid, grid = build_random(rng, n=300)
    q = pts[:50] + 1e-3  # near existing points
    D, I, nn = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                         0.2, TABLE, max_per_cell=64)
    D, I = np.asarray(D), np.asarray(I)
    for qi in range(q.shape[0]):
        real = I[qi][D[qi] < 1e9]
        assert len(np.unique(real)) == len(real)


def test_empty_map_returns_zero_neighbors(rng):
    cap = 256
    pts = np.zeros((cap, 3), np.float32)
    grid = knn.build(jnp.asarray(pts), jnp.zeros(cap, bool), 0.2, TABLE)
    q = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    D, I, nn = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                         0.2, TABLE)
    assert np.asarray(nn).sum() == 0
    assert (np.asarray(D) >= 1e9).all()


def test_per_query_radius(rng):
    pts, valid, grid = build_random(rng)
    q = rng.uniform(-0.9, 0.9, size=(16, 3)).astype(np.float32)
    radii = np.full(16, 0.05, np.float32)
    radii[8:] = 0.2
    D, I, nn = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                         jnp.asarray(radii), TABLE, max_per_cell=64)
    D2, I2, nn2 = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                            0.05, TABLE, max_per_cell=64)
    assert (np.asarray(nn)[:8] == np.asarray(nn2)[:8]).all()
    assert (np.asarray(nn)[8:] >= np.asarray(nn2)[8:]).all()


def test_incremental_insert_matches_rebuild(rng):
    """knn.insert must yield the same query results as a full rebuild."""
    cell = 0.4
    cap = 1024
    pts = rng.uniform(-1.0, 1.0, size=(cap, 3)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:300] = True
    grid = knn.build(jnp.asarray(pts), jnp.asarray(valid), cell, TABLE)
    # insert 200 more (indices 300..500) in two batches
    for lo, hi in ((300, 400), (400, 500)):
        grid = knn.insert(grid, TABLE, jnp.asarray(pts[lo:hi]),
                          jnp.arange(lo, hi, dtype=jnp.int32),
                          jnp.ones(hi - lo, bool))
        valid[lo:hi] = True
    full = knn.build(jnp.asarray(pts), jnp.asarray(valid), cell, TABLE)
    q = rng.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32)
    r = cell / 2
    D1, I1, n1 = knn.query(grid, jnp.asarray(pts), jnp.asarray(q), 8,
                           r, TABLE)
    D2, I2, n2 = knn.query(full, jnp.asarray(pts), jnp.asarray(q), 8,
                           r, TABLE)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D2), rtol=1e-5)
    assert (np.asarray(n1) == np.asarray(n2)).all()
    # same index sets among real hits
    D1, I1 = np.asarray(D1), np.asarray(I1)
    I2 = np.asarray(I2)
    for qi in range(64):
        real = D1[qi] < 1e9
        assert set(I1[qi][real]) == set(I2[qi][real])
