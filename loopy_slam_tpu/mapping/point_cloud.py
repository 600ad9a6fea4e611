"""Neural point cloud: fixed-capacity buffers with masked insertion.

TPU-native re-design of the reference NeuralPointCloud
(src/neural_point.py:30-1786). The reference grows Python lists + a faiss
index inside an RPC server process; here the map is a pytree of
fixed-capacity HBM arrays with a jittable insertion kernel and a
spatial-hash index (ops/knn.py), so tracking/mapping touch it as plain
array inputs — no RPC, no host round-trips on the hot path.

Insertion semantics match add_neural_points (neural_point.py:1557-1631):
candidate surface points (ray origin + dir * depth) are gated on having
ZERO existing neighbors within radius_add (radius_min for color-gradient
picks), and each surviving location contributes N_add=3 points stratified
along its ray in [near_end_surface*d, far_end_surface*d], with N(0, 0.1)
feature initialization. The sensor-space "input cloud" (used for final PLY
export and submap registration) is accumulated in a parallel buffer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import knn


def effective_cell_and_slots(cfg):
    """The ONE place the hash-grid cell edge and slot capacity derive from
    the config (MapOptions and RenderOptions both call this, so the
    build-time grid and the renderer's static options cannot disagree).

    Cell edge must cover the largest query radius so the 3x3x3 stencil is
    exact (dynamic radius can reach radius_query_ratio * radius_add_max),
    and bigger cells hold more points, so slot capacity scales up with
    them (row overflow silently drops neighbors; grid.n_dropped counts it
    and slam.map_frame surfaces it).
    """
    pc = cfg["pointcloud"]
    if cfg["use_dynamic_radius"]:
        cell = float(pc["radius_query_ratio"] * pc["radius_add_max"])
        mpc = max(int(pc["max_per_cell"]), 64)
    else:
        cell = float(pc["radius_query"])
        mpc = int(pc["max_per_cell"])
    return cell, mpc


class MapOptions(NamedTuple):
    """Static point-cloud configuration (hashable, from YAML pointcloud.*)."""

    capacity: int = 2 ** 19
    input_capacity: int = 2 ** 19
    c_dim: int = 32
    nn_num: int = 8
    N_add: int = 3
    radius_add: float = 0.04
    radius_min: float = 0.02
    radius_query: float = 0.08
    near_end_surface: float = 0.98
    far_end_surface: float = 1.02
    fix_interval_when_add_along_ray: bool = False
    cell_size: float = 0.08
    table_size: int = 2 ** 17
    max_per_cell: int = 16

    @staticmethod
    def from_cfg(cfg):
        pc = cfg["pointcloud"]
        cell, mpc = effective_cell_and_slots(cfg)
        return MapOptions(
            capacity=int(pc["capacity"]),
            input_capacity=int(pc.get("input_capacity", pc["capacity"])),
            c_dim=int(cfg["model"]["c_dim"]),
            nn_num=int(pc["nn_num"]),
            N_add=int(pc["N_add"]),
            radius_add=float(pc["radius_add"]),
            radius_min=float(pc["radius_min"]),
            radius_query=float(pc["radius_query"]),
            near_end_surface=float(pc["near_end_surface"]),
            far_end_surface=float(pc["far_end_surface"]),
            fix_interval_when_add_along_ray=bool(
                pc["fix_interval_when_add_along_ray"]),
            cell_size=cell,
            table_size=int(pc["cell_table_size"]),
            max_per_cell=mpc,
        )


class MapState(NamedTuple):
    """All mutable map arrays (a pytree; donate/carry through jitted steps)."""

    pos: jnp.ndarray        # (cap, 3) neural point positions
    feat: jnp.ndarray       # (cap, 2*c_dim) packed [geometry || color]
                            # features — ONE buffer so the render pass pays
                            # a single neighbor gather / backward scatter
    count: jnp.ndarray      # () int32 valid prefix length
    grid: knn.HashGrid      # spatial-hash index over pos[:count]
    in_pos: jnp.ndarray     # (in_cap, 3) sensor-space input cloud
    in_rgb: jnp.ndarray     # (in_cap, 3) input cloud colors in [0,1]
    in_count: jnp.ndarray   # () int32


def init_map(opts: MapOptions, capacity: int = None) -> MapState:
    """capacity overrides opts.capacity for the initial allocation — the
    orchestrator starts small and doubles as the map fills (optimizer and
    gradient traffic scale with the allocated capacity, so right-sizing
    keeps early mapping iterations cheap)."""
    cap, c = capacity or opts.capacity, opts.c_dim
    pos = jnp.zeros((cap, 3), jnp.float32)
    valid = jnp.zeros((cap,), bool)
    return MapState(
        pos=pos,
        feat=jnp.zeros((cap, 2 * c), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        grid=knn.build(pos, valid, opts.cell_size, opts.table_size,
                       opts.max_per_cell),
        in_pos=jnp.zeros((opts.input_capacity, 3), jnp.float32),
        in_rgb=jnp.zeros((opts.input_capacity, 3), jnp.float32),
        in_count=jnp.zeros((), jnp.int32),
    )


def valid_mask(state: MapState) -> jnp.ndarray:
    return jnp.arange(state.pos.shape[0]) < state.count


def add_points(state: MapState, opts: MapOptions, key,
               rays_o, rays_d, gt_depth, gt_color, cand_valid,
               dynamic_r_add=None, is_pts_grad=False) -> Tuple[MapState, jnp.ndarray]:
    """Masked point insertion (jittable). Returns (new_state, n_locations).

    Mirrors add_neural_points (neural_point.py:1557-1631): gate on zero
    neighbors within the add radius, spawn N_add points per gated location
    stratified along the ray, init features N(0, 0.1), rebuild the index.
    """
    A = rays_o.shape[0]
    cap = state.pos.shape[0]  # allocated capacity (may be < opts.capacity)
    cand_valid = cand_valid & (gt_depth > 0)
    pts_gt = rays_o + rays_d * gt_depth[:, None]

    r_add = opts.radius_min if is_pts_grad else opts.radius_add
    if dynamic_r_add is not None:
        r_add = dynamic_r_add
    _, _, nn_count = knn.query(state.grid, state.pos, pts_gt, opts.nn_num,
                               r_add, opts.table_size, opts.max_per_cell)
    # Also gate on the location's hash-cell row having free slots: a point
    # inserted into a full row is invisible to every future k-NN query
    # (grid.n_dropped), so it renders nothing AND its absence from the
    # nn_count==0 test above would keep attracting near-duplicates to the
    # same cell — a densification feedback loop observed on room0 (19% of
    # points dropped). Same-batch candidates count each other through a
    # per-cell rank (sorted grouping, like knn.insert). The reference
    # cannot hit this (faiss indexes everything); saturating a cell at M
    # indexed points is the TPU-native density cap.
    gate0 = cand_valid & (nn_count == 0)
    M = state.grid.cell_data.shape[1]

    # stratified points along the ray around the depth reading
    if opts.fix_interval_when_add_along_ray:
        z = gt_depth[:, None] + jnp.linspace(-0.04, 0.04, opts.N_add)
    else:
        t = jnp.linspace(0.0, 1.0, opts.N_add)
        d = gt_depth[:, None]
        z = opts.near_end_surface * d * (1.0 - t) + opts.far_end_surface * d * t
    new_pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]  # (A,N,3)

    # Row-capacity gate over EVERY spawned point's cell (round-3 fix): the
    # N_add points spread +-0.04 d along the ray — at full scale ~+-10 cm
    # vs 8-16 cm cells — so they routinely straddle into a NEIGHBORING cell
    # of the location's own. Gating only the location cell (the round-2
    # form) let those strays land in full rows and be dropped by
    # knn.insert: the steady 35-39 knn_dropped/frame on room0_1k. A
    # location is accepted only if all N_add spawned points have free
    # slots; same-batch contenders count each other via a per-hashed-row
    # rank (conservative: ranks are over all gate0 candidates' points, so
    # a rejected location still occupies its rank this batch).
    AN = A * opts.N_add
    # the grid's OWN table size, not the configured one: build_adaptive
    # may have grown the table at a PGO-correction rebuild, and knn.insert
    # routes by the grown size — hashing the gate with the configured size
    # would check cell_fill at the wrong rows for ~half the candidates
    table_size = state.grid.cell_data.shape[0] - 1
    cell_h3 = knn._hash_cells(
        knn._cell_of(new_pts.reshape(AN, 3), state.grid.cell_size),
        table_size)  # (A*N,)
    key_h = jnp.where(jnp.repeat(gate0, opts.N_add), cell_h3,
                      jnp.int32(table_size))
    h_order = jnp.argsort(key_h).astype(jnp.int32)
    cs = key_h[h_order]
    first = jnp.searchsorted(cs, cs, side="left").astype(jnp.int32)
    rank_sorted = jnp.arange(AN, dtype=jnp.int32) - first
    cell_rank = jnp.zeros(AN, jnp.int32).at[h_order].set(rank_sorted)
    fits = (state.grid.cell_fill[cell_h3] + cell_rank < M).reshape(
        A, opts.N_add)
    gate = gate0 & jnp.all(fits, axis=1)

    # compacting scatter: location a -> slots base[a] .. base[a]+N_add-1
    slot_rank = jnp.cumsum(gate.astype(jnp.int32)) - 1  # rank among gated
    base = state.count + slot_rank * opts.N_add
    gate = gate & (base + opts.N_add <= cap)
    dest = base[:, None] + jnp.arange(opts.N_add, dtype=jnp.int32)  # (A,N)
    dest = jnp.where(gate[:, None], dest, cap)  # out-of-range -> dropped

    pos = state.pos.at[dest.reshape(-1)].set(
        new_pts.reshape(-1, 3), mode="drop")
    n_new = A * opts.N_add
    feat_init = 0.1 * jax.random.normal(key, (n_new, 2 * opts.c_dim))
    feat = state.feat.at[dest.reshape(-1)].set(feat_init, mode="drop")
    n_loc = jnp.sum(gate).astype(jnp.int32)
    count = state.count + n_loc * opts.N_add

    # input (sensor) cloud: one point per gated location
    in_rank = state.in_count + slot_rank
    in_dest = jnp.where(gate & (in_rank < opts.input_capacity), in_rank,
                        opts.input_capacity)
    in_pos = state.in_pos.at[in_dest].set(pts_gt, mode="drop")
    in_rgb = state.in_rgb.at[in_dest].set(gt_color, mode="drop")
    in_count = jnp.minimum(state.in_count + n_loc, opts.input_capacity)

    # incremental index update: O(batch) instead of a full rebuild
    grid = knn.insert(state.grid, opts.table_size,
                      new_pts.reshape(-1, 3), dest.reshape(-1),
                      jnp.repeat(gate, opts.N_add))
    return MapState(pos=pos, feat=feat, count=count, grid=grid,
                    in_pos=in_pos, in_rgb=in_rgb, in_count=in_count), n_loc


@partial(jax.jit, static_argnames=("input_capacity",),
         donate_argnames=("in_pos", "in_rgb"))
def input_cloud_insert(in_pos, in_rgb, in_count, rays_o, rays_d, d, c,
                       gate, input_capacity: int):
    """Append one sensor-space point per gated candidate location to the
    input cloud (the add_points in_pos/in_rgb update, factored out for the
    map-sharded path where the neural points live on the mesh but the
    input cloud stays single-device)."""
    pts_gt = rays_o + rays_d * d[:, None]
    rank = jnp.cumsum(gate.astype(jnp.int32)) - 1
    in_rank = in_count + rank
    in_dest = jnp.where(gate & (in_rank < input_capacity), in_rank,
                        input_capacity)
    in_pos = in_pos.at[in_dest].set(pts_gt, mode="drop")
    in_rgb = in_rgb.at[in_dest].set(c, mode="drop")
    n_loc = jnp.sum(gate).astype(jnp.int32)
    in_count = jnp.minimum(in_count + n_loc, input_capacity)
    return in_pos, in_rgb, in_count


def sample_near_pcl_z_vals(state: MapState, opts: MapOptions,
                           rays_o, rays_d, near, far, num: int):
    """z-vals for zero-depth rays, biased to where the point cloud lives.

    Matches neural_point.sample_near_pcl (neural_point.py:1734-1786): probe
    25 depths per ray, find the first two probe depths with any in-radius
    neighbor, and place `num` samples between them; rays with fewer than two
    occupied probes fall back to uniform [near, far] and are flagged invalid.
    """
    return sample_near_pcl_z_vals_raw(state.pos, state.grid, rays_o, rays_d,
                                      near, far, num, opts.radius_query,
                                      opts.nn_num, opts.table_size,
                                      opts.max_per_cell)


def sample_near_pcl_z_vals_raw(pos, grid, rays_o, rays_d, near, far,
                               num: int, radius_query, nn_num: int,
                               table_size: int, max_per_cell: int,
                               occupied_fn=None):
    """occupied_fn(pts) -> bool (N,) overrides the local-grid occupancy
    probe — the map-sharded path supplies each-shard-probes-its-own-cells
    + psum (parallel/map_shard.py), which sees the GLOBAL point set."""
    R = rays_o.shape[0]
    intervals = 25
    t = jnp.linspace(0.0, 1.0, intervals)
    z_probe = near * (1.0 - t) + far * t  # far may be traced
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_probe[None, :, None]
           ).reshape(-1, 3)
    if occupied_fn is None:
        _, _, nn_count = knn.query(grid, pos, pts, nn_num, radius_query,
                                   table_size, max_per_cell)
        occupied = (nn_count > 0).reshape(R, intervals)
    else:
        occupied = occupied_fn(pts).reshape(R, intervals)
    n_occ = jnp.sum(occupied, axis=-1)
    invalid = n_occ < 2
    first = jnp.argmax(occupied, axis=-1)
    occupied2 = occupied.at[jnp.arange(R), first].set(False)
    second = jnp.argmax(occupied2, axis=-1)
    z0 = jnp.where(invalid, near, z_probe[first])
    z1 = jnp.where(invalid, far, z_probe[second])
    t = jnp.linspace(0.0, 1.0, num)
    z_vals = z0[:, None] * (1.0 - t) + z1[:, None] * t
    return z_vals, invalid
