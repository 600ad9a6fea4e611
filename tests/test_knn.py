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


def test_rigid_transform_rebuild_rebinning_drops_are_bounded():
    """Pins the one remaining knn_dropped source (room0_r3 run: exactly 13
    drops appearing at the PGO-correction frame): a rigid transform moves
    points relative to the hash LATTICE, so two cells' points can re-bin
    into one row at rebuild and overflow max_per_cell. The insertion-time
    per-point gate keeps rows <= M, so a rebuild of UNMOVED points never
    drops; after an arbitrary rigid motion drops are possible but bounded
    to a tiny fraction (density is preserved, binning shifts by <= 1 cell
    per axis)."""
    from loopy_slam_tpu.ops import knn

    rng = np.random.default_rng(5)
    cell, M, T = 0.1, 8, 2 ** 12
    # pack points to exactly M per cell on a lattice patch
    base = np.stack(np.meshgrid(*[np.arange(4)] * 3),
                    -1).reshape(-1, 3) * cell  # 64 cells
    pts = (base[:, None, :]
           + rng.uniform(0.01, 0.09, (len(base), M, 3))).reshape(-1, 3)
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.ones(len(pts), bool)
    g0 = knn.build(pts, valid, cell, T, M)
    assert int(g0.n_dropped) == 0, "untransformed rebuild must not drop"

    # rigid motion: rotation + half-cell shift (worst-case re-binning)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    moved = pts @ jnp.asarray(R).T + jnp.asarray([0.05, 0.05, 0.0])
    g1 = knn.build(moved, valid, cell, T, M)
    dropped = int(g1.n_dropped)
    # bounded: a small fraction of the buffer (room0_r3 measured 0.07%)
    assert dropped <= len(pts) * 0.2, dropped
    # and queries still find (1 - drop_rate) of neighbors: probe each
    # original cell center's moved position
    centers = (base + 0.05) @ R.T + np.array([0.05, 0.05, 0.0])
    _, _, nn = knn.query(g1, moved, jnp.asarray(centers, jnp.float32),
                         8, 0.1, T, M)
    assert int(jnp.sum(nn > 0)) >= len(centers) * 0.8


def test_build_adaptive_recovers_overflowed_points():
    """Off-hot-path rebuilds must not silently hide points: build_adaptive
    doubles max_per_cell until n_dropped == 0 (room0_r3d's merged global
    map overflowed 21% of its 136k points at the fragment-map capacity —
    all invisible to color refine and final eval)."""
    rng = np.random.default_rng(11)
    cell, M, T = 0.1, 8, 2 ** 12
    # 3x the row capacity packed into each of 27 cells
    base = np.stack(np.meshgrid(*[np.arange(3)] * 3),
                    -1).reshape(-1, 3) * cell
    pts = (base[:, None, :]
           + rng.uniform(0.01, 0.09, (len(base), 3 * M, 3))).reshape(-1, 3)
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.ones(len(pts), bool)

    g_fixed = knn.build(pts, valid, cell, T, M)
    assert int(g_fixed.n_dropped) > 0  # the failure mode exists

    g = knn.build_adaptive(pts, valid, cell, T, M)
    assert int(g.n_dropped) == 0
    assert g.cell_data.shape[1] == 4 * M  # two doublings needed
    # every point is reachable: query at each point finds itself
    D, I, nn = knn.query(g, pts, pts, 1, 0.02, T, g.cell_data.shape[1])
    assert bool(jnp.all(nn >= 1))


def test_build_adaptive_grows_table_when_collision_bound():
    """The r4 flagship's 128k-point global merge dropped 568 rows even
    after 3 row doublings: at high load factor, hash collisions merge
    DISTINCT cells into shared rows, and row depth alone cannot fix
    that. build_adaptive must escalate table size too, and queries must
    hash with the grid's own (grown) table size — hashing with the
    configured size would silently probe the wrong rows."""
    rng = np.random.default_rng(31)
    cell, M, T = 0.1, 8, 2 ** 4  # tiny table: collisions guaranteed
    # 200 occupied cells over a 16-row table -> ~12 cells/row; each cell
    # holds M points, so merged rows carry ~100 points — beyond the
    # row-doubling ceiling (8 -> 64); only a bigger table can fit them
    base = np.stack(np.meshgrid(*[np.arange(6)] * 3),
                    -1).reshape(-1, 3)[:200] * cell
    pts = (base[:, None, :]
           + rng.uniform(0.01, 0.09, (len(base), M, 3))).reshape(-1, 3)
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.ones(len(pts), bool)

    g = knn.build_adaptive(pts, valid, cell, T, M)
    assert int(g.n_dropped) == 0
    assert g.cell_data.shape[0] - 1 > T  # table actually grew
    # every point reachable through query (which must use the GROWN size
    # internally even though the caller passes the configured T)
    D, I, nn = knn.query(g, pts, pts, 1, 0.02, T, g.cell_data.shape[1])
    assert bool(jnp.all(nn >= 1))
    # insert into the grown grid also routes by the grown table
    extra = jnp.asarray(rng.uniform(0.01, 0.55, (16, 3)).astype(np.float32))
    g2 = knn.insert(g, T, extra,
                    jnp.arange(len(pts), len(pts) + 16, dtype=jnp.int32),
                    jnp.ones(16, bool))
    allp = jnp.concatenate([pts, extra])
    D2, I2, nn2 = knn.query(g2, allp, extra, 1, 0.02, T,
                            g2.cell_data.shape[1])
    assert bool(jnp.all(nn2 >= 1))


def test_wide_row_selection_matches_brute_force():
    """M=128 rows (the adaptive global-merge capacity that killed the r4
    flagship run at frame 1999: 27*128*4 = 13824 lanes > the old 8188-lane
    11-bit-id limit) must select correctly — the packed-key id width now
    grows with the row. D keeps its upper-bound contract at the wider
    mask (12 bits -> <= 2^-11 relative, rounded up)."""
    rng = np.random.default_rng(21)
    cell, M, T = 0.1, 128, 2 ** 10
    # one dense cell cluster: 120 points inside a single cell (> M=64,
    # <= the max_doublings=3 ceiling of 128)
    pts = jnp.asarray(
        rng.uniform(0.31, 0.39, (120, 3)).astype(np.float32))
    valid = jnp.ones(len(pts), bool)
    g = knn.build_adaptive(pts, valid, cell, T, 16)
    assert g.cell_data.shape[1] >= 128  # wide-row regime reached
    assert int(g.n_dropped) == 0

    q = jnp.asarray(rng.uniform(0.30, 0.40, (37, 3)).astype(np.float32))
    D, I, nn = knn.query(g, pts, q, 8, 0.05, T, g.cell_data.shape[1])
    D_bf, I_bf = knn.brute_force_knn(pts, valid, q, 8)
    # same neighbor sets (order may differ at exact ties)
    assert (np.sort(np.asarray(I), 1) == np.sort(np.asarray(I_bf), 1)).all()
    # D is an upper bound within 2^-11 relative of the exact distance
    D, D_bf = np.asarray(D), np.asarray(D_bf)
    assert (D >= D_bf - 1e-12).all()
    np.testing.assert_allclose(D, D_bf, rtol=2 ** -10)
    assert (np.asarray(nn) == (D_bf < 0.05 ** 2).sum(1)).all()
