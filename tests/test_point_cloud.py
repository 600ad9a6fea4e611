import jax
import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.mapping.point_cloud import (MapOptions, add_points,
                                                init_map, valid_mask)
from loopy_slam_tpu.ops import knn

OPTS = MapOptions(capacity=4096, input_capacity=4096, c_dim=8, N_add=3,
                  radius_add=0.1, radius_query=0.2, cell_size=0.4,
                  table_size=2 ** 14, max_per_cell=32)


def make_rays(rng, n):
    rays_o = np.zeros((n, 3), np.float32)
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    depth = rng.uniform(1.0, 2.0, n).astype(np.float32)
    color = rng.uniform(size=(n, 3)).astype(np.float32)
    return (jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(depth),
            jnp.asarray(color))


def test_add_points_basic(rng):
    state = init_map(OPTS)
    ro, rd, d, c = make_rays(rng, 64)
    key = jax.random.PRNGKey(0)
    state, n_loc = add_points(state, OPTS, key, ro, rd, d, c,
                              jnp.ones(64, bool))
    n_loc = int(n_loc)
    assert n_loc > 0
    assert int(state.count) == n_loc * OPTS.N_add
    assert int(state.in_count) == n_loc
    # all N_add points per location lie between 0.98d and 1.02d of the ray
    pos = np.asarray(state.pos[:int(state.count)])
    dist = np.linalg.norm(pos, axis=-1)
    assert dist.min() > 0.9 and dist.max() < 2.1


def test_add_points_gate_blocks_duplicates(rng):
    state = init_map(OPTS)
    ro, rd, d, c = make_rays(rng, 64)
    key = jax.random.PRNGKey(0)
    state, n1 = add_points(state, OPTS, key, ro, rd, d, c, jnp.ones(64, bool))
    # adding the exact same candidates again: all have neighbors now
    state, n2 = add_points(state, OPTS, jax.random.PRNGKey(1), ro, rd, d, c,
                           jnp.ones(64, bool))
    assert int(n2) == 0
    assert int(state.count) == int(n1) * OPTS.N_add


def test_add_points_respects_validity_and_depth(rng):
    state = init_map(OPTS)
    ro, rd, d, c = make_rays(rng, 32)
    d = d.at[:16].set(0.0)  # invalid depth
    valid = jnp.ones(32, bool).at[16:24].set(False)
    state, n = add_points(state, OPTS, jax.random.PRNGKey(0), ro, rd, d, c,
                          valid)
    assert int(n) <= 8


def test_grid_is_queryable_after_add(rng):
    state = init_map(OPTS)
    ro, rd, d, c = make_rays(rng, 64)
    state, n = add_points(state, OPTS, jax.random.PRNGKey(0), ro, rd, d, c,
                          jnp.ones(64, bool))
    pts_gt = np.asarray(ro + rd * d[:, None])
    D, I, nn = knn.query(state.grid, state.pos, jnp.asarray(pts_gt), 8,
                         OPTS.radius_query, OPTS.table_size, OPTS.max_per_cell)
    # every surviving surface point has its own added points as neighbors
    assert (np.asarray(nn) > 0).mean() > 0.99


def test_capacity_overflow_drops_not_corrupts(rng):
    small = OPTS._replace(capacity=32, input_capacity=16)
    state = init_map(small)
    ro, rd, d, c = make_rays(rng, 64)
    state, n = add_points(state, small, jax.random.PRNGKey(0), ro, rd, d, c,
                          jnp.ones(64, bool))
    assert int(state.count) <= 32
    assert int(state.in_count) <= 16


def test_full_cell_gate_stops_densification(rng):
    """A saturated hash-cell row must stop attracting insertions: points an
    overflowed row cannot index are invisible to k-NN (including the
    nn==0 insertion gate itself), which previously caused a densification
    feedback loop (19% dropped points on the room0-scale run)."""
    opts = OPTS._replace(max_per_cell=4, radius_add=1e-4)
    state = init_map(opts)
    # all candidates in ONE cell (cell_size 0.4), tiny r_add so the
    # zero-neighbor gate never blocks them
    n = 32
    rays_o = jnp.zeros((n, 3), jnp.float32)
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    rng_l = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    total_dropped = 0
    for it in range(4):
        d = jnp.asarray(rng_l.uniform(0.20, 0.21, n).astype(np.float32))
        c = jnp.asarray(rng_l.uniform(size=(n, 3)).astype(np.float32))
        key, k = jax.random.split(key)
        state, _ = add_points(state, opts, k, rays_o, rays_d, d, c,
                              jnp.ones(n, bool))
        total_dropped = int(state.grid.n_dropped)
    # round-3 per-spawned-point gate: a location is accepted only if ALL
    # its N_add points have free row slots, so nothing is ever dropped
    assert total_dropped == 0
    assert int(state.count) <= (opts.max_per_cell + opts.N_add - 1) * 2


def test_straddling_spawn_gated_no_silent_drops(rng):
    """The N_add spawn spreads over [0.98d, 1.02d] and can straddle into a
    NEIGHBORING cell of the location's own. Round 2 gated only the
    location's cell row, so straddling points landing in a full row were
    silently dropped by knn.insert (the steady 35-39 knn_dropped/frame on
    the room0_1k run). The round-3 per-spawned-point gate must reject the
    whole location instead: n_dropped stays exactly 0."""
    opts = OPTS._replace(max_per_cell=4, radius_add=1e-4)
    state = init_map(opts)
    z_axis = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    # saturate the cell z in [0.4, 0.8) (cell_size 0.4) to EXACTLY
    # max_per_cell rows: prefill with N_add=1 so the per-point gate can
    # fill the row completely
    n = 16
    rays_o = jnp.zeros((n, 3), jnp.float32)
    rays_d = jnp.tile(z_axis, (n, 1))
    d = jnp.asarray(np.linspace(0.45, 0.75, n).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(0).uniform(
        size=(n, 3)).astype(np.float32))
    state, _ = add_points(state, opts._replace(N_add=1),
                          jax.random.PRNGKey(1),
                          rays_o, rays_d, d, c, jnp.ones(n, bool))
    assert int(state.grid.n_dropped) == 0
    row_full = int(np.asarray(state.grid.cell_fill).max())
    assert row_full == opts.max_per_cell

    # candidate at d=0.395: pts_gt lies in cell 0 but the far spawn point
    # (1.02 * 0.395 = 0.4029) lands in the saturated neighboring cell
    before = int(state.count)
    state, n_loc = add_points(
        state, opts, jax.random.PRNGKey(2), rays_o[:1], rays_d[:1],
        jnp.asarray([0.395], jnp.float32), c[:1], jnp.ones(1, bool))
    assert int(n_loc) == 0, "straddling location must be rejected"
    assert int(state.count) == before
    assert int(state.grid.n_dropped) == 0, "no silent index drops"
