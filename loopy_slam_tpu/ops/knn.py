"""Spatial-hash radius k-NN over a fixed-capacity point buffer.

TPU-native replacement for the reference's faiss-gpu IVFFlat index
(reference src/neural_point.py:67-71,1659-1708): instead of IVF clustering
(train/add/search with nprobe=4, approximate), points are hashed into a
spatial grid of cell edge >= the query radius. A query inspects the 3x3x3
neighboring cells and takes the k nearest candidates — exact within the
radius as long as radius <= cell_size, fully jittable, static shapes.

Performance-critical layout (measured on a v5e): XLA gather cost on TPU is
per-ROW (~6 ns/row regardless of row width up to 128 lanes), so the index
is ONE WIDE ROW PER CELL: `cell_data[h]` holds the cell's up-to-M
candidates packed as (x, y, z, bitcast(point_index)) — a 25k-query batch
costs 675k row-gathers instead of 10.8M element-gathers (~65 ms -> ~5 ms),
and the winners' point indices come back by bitcasting the 4th lane, with
no second gather. Empty slots hold positions of 1e9 so validity falls out
of the distance test; no per-cell counts are needed at query time.

Hash collisions merge cells' candidate rows (the distance test filters
false candidates, exactly like extra faiss probes); true neighbors are
lost only if a row overflows its M slots.

Query semantics match find_neighbors_faiss: returns squared L2 distances D
(ascending), indices I, and neighbor_num = count(D < radius^2), where the
radius may be scalar or per-query (dynamic radius).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Large primes for 3-D spatial hashing (Teschner et al. 2003).
_P1, _P2, _P3 = np.int32(73856093), np.int32(19349669), np.int32(83492791)

# 27 neighbor-cell offsets, static.
_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)

_FAR = 1e9
_IDX_TAG = np.int32(1 << 30)  # exponent tag keeping packed indices normal


class HashGrid(NamedTuple):
    """Spatial-hash index: one packed candidate row per cell.

    cell_data: (table_size, max_per_cell, 4) float32 — per candidate
      (x, y, z, bitcast int32 point-buffer index); empty slots are
      (1e9, 1e9, 1e9, bitcast 0).
    cell_size: () float32.
    """

    cell_data: jnp.ndarray
    cell_size: jnp.ndarray


def _hash_cells(ijk: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """int32 cell coords (..., 3) -> hash in [0, table_size). table_size
    must be a power of two (masking keeps the result non-negative)."""
    h = (ijk[..., 0] * _P1) ^ (ijk[..., 1] * _P2) ^ (ijk[..., 2] * _P3)
    return h & jnp.int32(table_size - 1)


def _cell_of(points: jnp.ndarray, cell_size) -> jnp.ndarray:
    return jnp.floor(points / cell_size).astype(jnp.int32)


def build(points: jnp.ndarray, valid: jnp.ndarray, cell_size,
          table_size: int, max_per_cell: int = 16) -> HashGrid:
    """Build (or rebuild) the index. O(N log N) sort + scatter, jittable.

    Replaces faiss index train/add (reference neural_point.py:1623-1627);
    called after every point-insertion batch and at submap boundaries.
    """
    cap = points.shape[0]
    codes = _hash_cells(_cell_of(points, cell_size), table_size)
    codes = jnp.where(valid, codes, jnp.int32(table_size))
    order = jnp.argsort(codes).astype(jnp.int32)
    codes_sorted = codes[order]
    counts = jnp.zeros((table_size + 1,), jnp.int32).at[codes].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    # rank of each sorted point within its cell
    rank = jnp.arange(cap, dtype=jnp.int32) - starts[codes_sorted]
    ok = (codes_sorted < table_size) & (rank < max_per_cell)
    row = jnp.where(ok, codes_sorted, table_size)
    col = jnp.where(ok, rank, 0)
    # indices are < 2^23, whose raw bit patterns are DENORMAL floats — TPU
    # flushes denormals to zero somewhere along the data path, silently
    # zeroing every neighbor index. Setting exponent bit 30 makes the
    # pattern a normal float; the query masks it back off.
    idx_bits = jax.lax.bitcast_convert_type(order | _IDX_TAG, jnp.float32)
    packed = jnp.concatenate(
        [points[order], idx_bits[:, None]], axis=-1)
    # broadcast (not scatter) init: XLA constant-folds big scatters of
    # constants at compile time, baking a ~134 MB literal into every
    # program containing build()
    empty_row = jnp.concatenate(
        [jnp.full((3,), _FAR, jnp.float32),
         jax.lax.bitcast_convert_type(_IDX_TAG, jnp.float32)[None]])
    cell_data = jnp.broadcast_to(
        empty_row, (table_size + 1, max_per_cell, 4))
    cell_data = cell_data.at[row, col].set(packed, mode="drop")
    return HashGrid(cell_data=cell_data[:table_size],
                    cell_size=jnp.asarray(cell_size, jnp.float32))


def query(grid: HashGrid, points: jnp.ndarray, queries: jnp.ndarray,
          k: int, radius, table_size: int, max_per_cell: int = 16,
          return_pos: bool = False):
    """k nearest neighbors of each query within the 3x3x3 cell stencil.

    Args:
      grid: HashGrid over `points`.
      points: (cap, 3) point buffer (API parity; candidate positions come
        from the packed rows).
      queries: (Q, 3).
      k: neighbors returned (pointcloud.nn_num = 8).
      radius: scalar or (Q,) — the radius used for neighbor_num counting.
      table_size: static hash table size (power of two).
      max_per_cell: static candidate slots per cell row.

    Returns:
      D: (Q, k) squared distances, ascending; empty slots hold >= 1e10.
      I: (Q, k) int32 indices into the point buffer (0 where empty).
      neighbor_num: (Q,) int32 count of D < radius**2.
    """
    M = grid.cell_data.shape[1]  # authoritative (build-time) slot count
    Q = queries.shape[0]
    q_cells = _cell_of(queries, grid.cell_size)  # (Q, 3)
    cells = q_cells[:, None, :] + jnp.asarray(_OFFSETS)[None, :, :]  # (Q,27,3)
    h = _hash_cells(cells, table_size)  # (Q, 27)

    # Drop cells whose hash collides with an earlier cell in the stencil —
    # otherwise the same row would be scanned twice and a neighbor
    # duplicated (faiss never returns duplicates).
    dup = jnp.tril(h[:, :, None] == h[:, None, :], k=-1).any(axis=-1)

    rows = jnp.take(grid.cell_data.reshape(table_size, M * 4),
                    h.reshape(-1), axis=0).reshape(Q, 27, M, 4)
    cand_pos = rows[..., :3]
    diff = cand_pos - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(dup[..., None], jnp.inf, d2)

    flat_d2 = d2.reshape(Q, -1)
    neg_top, top_pos = jax.lax.top_k(-flat_d2, k)
    D = -neg_top
    idx_f = jnp.take_along_axis(rows[..., 3].reshape(Q, -1), top_pos,
                                axis=-1)
    I = jax.lax.bitcast_convert_type(idx_f, jnp.int32) & (_IDX_TAG - 1)
    valid_hit = D < 1e10  # empty slots sit at >= (1e9)^2-ish distances
    I = jnp.where(valid_hit, I, 0)
    D = jnp.where(valid_hit, D, 1e10)

    r = jnp.asarray(radius)
    r2 = (r**2)[..., None] if r.ndim == 1 else r**2
    neighbor_num = jnp.sum(D < r2, axis=-1).astype(jnp.int32)
    if return_pos:
        # winners' positions straight from the already-fetched candidate
        # rows — saves the caller a 200k-row HBM gather of points[I]
        pos = jnp.take_along_axis(cand_pos.reshape(Q, -1, 3),
                                  top_pos[..., None], axis=1)
        pos = jnp.where(valid_hit[..., None], pos, _FAR)
        return D, I, neighbor_num, pos
    return D, I, neighbor_num


def brute_force_knn(points, valid, queries, k):
    """Reference oracle: exact k-NN by full pairwise distances (test use)."""
    d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :], d2, 1e10)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return -neg_top, idx
