"""Spatial-hash radius k-NN over a fixed-capacity point buffer.

TPU-native replacement for the reference's faiss-gpu IVFFlat index
(reference src/neural_point.py:67-71,1659-1708): instead of IVF clustering
(train/add/search with nprobe=4, approximate), points are hashed into a
spatial grid of cell edge >= the query radius, stored as a sorted array of
cell hash codes. A query inspects the 3x3x3 neighboring cells via binary
search (jnp.searchsorted) and takes the k nearest candidates — exact within
the radius as long as radius <= cell_size, fully jittable, static shapes.

Hash collisions only ever ADD candidates (they are filtered by the true
distance test), never drop true neighbors, except when a cell's candidate
list overflows max_per_cell slots.

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


class HashGrid(NamedTuple):
    """Sorted spatial-hash index over a point buffer.

    codes: (cap,) int32 — hash code per sorted slot; invalid slots hold the
      sentinel `table_size` so they sort to the end and no query hash
      (always < table_size) matches them.
    order: (cap,) int32 — point-buffer index occupying each sorted slot.
    cell_size: () float32.
    """

    codes: jnp.ndarray
    order: jnp.ndarray
    cell_size: jnp.ndarray


def _hash_cells(ijk: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """int32 cell coords (..., 3) -> hash in [0, table_size). table_size
    must be a power of two (masking keeps the result non-negative)."""
    h = (ijk[..., 0] * _P1) ^ (ijk[..., 1] * _P2) ^ (ijk[..., 2] * _P3)
    return h & jnp.int32(table_size - 1)


def _cell_of(points: jnp.ndarray, cell_size) -> jnp.ndarray:
    return jnp.floor(points / cell_size).astype(jnp.int32)


def build(points: jnp.ndarray, valid: jnp.ndarray, cell_size,
          table_size: int) -> HashGrid:
    """Build (or rebuild) the index. O(N log N) sort, jittable.

    Replaces faiss index train/add (reference neural_point.py:1623-1627);
    called after every point-insertion batch and at submap boundaries.
    """
    codes = _hash_cells(_cell_of(points, cell_size), table_size)
    codes = jnp.where(valid, codes, jnp.int32(table_size))
    order = jnp.argsort(codes).astype(jnp.int32)
    return HashGrid(
        codes=codes[order].astype(jnp.int32),
        order=order,
        cell_size=jnp.asarray(cell_size, jnp.float32),
    )


def query(grid: HashGrid, points: jnp.ndarray, queries: jnp.ndarray,
          k: int, radius, table_size: int, max_per_cell: int = 16):
    """k nearest neighbors of each query within the 3x3x3 cell stencil.

    Args:
      grid: HashGrid over `points`.
      points: (cap, 3) point buffer (invalid slots may hold garbage; they are
        never indexed because their codes are the sentinel).
      queries: (Q, 3).
      k: neighbors returned (pointcloud.nn_num = 8).
      radius: scalar or (Q,) — the radius used for neighbor_num counting.
      table_size: static hash table size (power of two).
      max_per_cell: static cap of candidates gathered per cell.

    Returns:
      D: (Q, k) squared distances, ascending; empty slots hold 1e10.
      I: (Q, k) int32 indices into the point buffer (0 where empty).
      neighbor_num: (Q,) int32 count of D < radius**2.
    """
    cap = points.shape[0]
    q_cells = _cell_of(queries, grid.cell_size)  # (Q, 3)
    cells = q_cells[:, None, :] + jnp.asarray(_OFFSETS)[None, :, :]  # (Q,27,3)
    h = _hash_cells(cells, table_size)  # (Q, 27)

    # Drop cells whose hash collides with an earlier cell in the stencil —
    # otherwise the same sorted range would be gathered twice and a neighbor
    # duplicated (faiss never returns duplicates).
    dup = jnp.tril(h[:, :, None] == h[:, None, :], k=-1).any(axis=-1)

    start = jnp.searchsorted(grid.codes, h, side="left").astype(jnp.int32)
    end = jnp.searchsorted(grid.codes, h, side="right").astype(jnp.int32)
    count = jnp.where(dup, 0, jnp.minimum(end - start, max_per_cell))

    lane = jnp.arange(max_per_cell, dtype=jnp.int32)
    slots = start[..., None] + lane  # (Q, 27, M)
    cand_ok = lane < count[..., None]
    slots = jnp.clip(slots, 0, cap - 1)
    cand_idx = grid.order[slots]  # (Q, 27, M)
    cand_pos = points[cand_idx]  # (Q, 27, M, 3)
    diff = cand_pos - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_ok, d2, 1e10)

    flat_d2 = d2.reshape(queries.shape[0], -1)
    flat_idx = cand_idx.reshape(queries.shape[0], -1)
    neg_top, top_pos = jax.lax.top_k(-flat_d2, k)
    D = -neg_top
    I = jnp.take_along_axis(flat_idx, top_pos, axis=-1)
    I = jnp.where(D < 1e9, I, 0)

    r = jnp.asarray(radius)
    r2 = (r**2)[..., None] if r.ndim == 1 else r**2
    neighbor_num = jnp.sum(D < r2, axis=-1).astype(jnp.int32)
    return D, I, neighbor_num


def brute_force_knn(points, valid, queries, k):
    """Reference oracle: exact k-NN by full pairwise distances (test use)."""
    d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :], d2, 1e10)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return -neg_top, idx
