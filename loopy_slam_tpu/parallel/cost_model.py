"""Analytic per-step collective-traffic model for the two multi-chip
flavors, so scaling efficiency on real hardware is a computed budget
instead of a guess (round-4 verdict: the ~2 MB/step/shard docstring
estimate in map_shard.py was never checked against anything).

Two flavors (SURVEY.md §2.4):

- **ray-DP** (`parallel/sharded.py`): the map is REPLICATED; rays are
  data-parallel; every optimizer iteration psums the full gradient
  pytree (decoders + the whole feature buffer). Ring all-reduce moves
  2·(n−1)/n · |grads| bytes per chip per iteration — the feature buffer
  dominates (capacity × 2·c_dim × 4 B), so this flavor trades ICI
  bandwidth for zero resharding complexity and only pays when capacity
  is small relative to ICI (the bench map at 2^15 points ≈ 8.4 MB grads
  → ~14.7 MB/chip/iter on 8 chips; at 45 GB/s/link ICI that is ~0.4 ms,
  well under the ~5 ms compute of a 5000-ray iteration).

- **map-shard** (`parallel/map_shard.py`): the point buffer is
  cell-sharded; every sample decode runs a ring k-NN (n hops of the
  query block + running top-k) and a ring feature fetch (n hops of
  [feat‖pos] rows, reversed again by the VJP). Traffic scales with the
  SAMPLE count, not the map size.

All sizes are bytes **per chip per executed collective**; "per
iteration" quantities multiply by device_chunk_iters for a chunk and by
chunks-per-frame for a mapped frame. f32 wire format (4 B) throughout —
the implementations psum/permute f32 today.
"""

from typing import Dict

F32 = 4


def tree_bytes(tree) -> int:
    """Total payload bytes of an array pytree (leaves: anything with
    .size and .dtype, or ShapeDtypeStructs)."""
    import jax
    import numpy as np

    total = 0
    for leaf in jax.tree.leaves(tree):
        size = int(np.prod(getattr(leaf, "shape", ())) or 1)
        dtype = np.dtype(getattr(leaf, "dtype", np.float32))
        total += size * dtype.itemsize
    return total


def allreduce_bytes_per_chip(payload_bytes: int, n_devices: int) -> float:
    """Ring all-reduce (psum) wire traffic per chip: reduce-scatter +
    all-gather, each moving (n−1)/n of the payload."""
    if n_devices <= 1:
        return 0.0
    return 2.0 * (n_devices - 1) / n_devices * payload_bytes


def dp_iter_bytes_per_chip(trainable, n_devices: int) -> float:
    """ray-DP: one optimizer iteration psums grads of the whole trainable
    pytree (mapper._optimize_map_impl psum_axis path) plus the loss aux
    (negligible, included for honesty: 3 scalars)."""
    return allreduce_bytes_per_chip(tree_bytes(trainable) + 3 * F32,
                                    n_devices)


def ring_knn_bytes_per_chip(q_local: int, k: int, n_devices: int) -> float:
    """map-shard ring k-NN: n ppermute hops, each moving this shard's
    rotating state — queries (Q,3) + radii (Q,) + best D/I/O (Q,k) each
    (map_shard.ring_knn carry)."""
    per_hop = q_local * (4 * F32 + 3 * k * F32)
    return n_devices * per_hop


def ring_fetch_bytes_per_chip(q_local: int, k: int, feat_dim: int,
                              n_devices: int,
                              with_backward: bool = True) -> float:
    """map-shard ring fetch: n hops of (I, owner, acc[Q,k,F]) with
    F = feat_dim + 3 packed [feat‖pos] lanes (map_shard.ring_fetch); the
    VJP reverses the ring with a same-shaped cotangent."""
    F = feat_dim + 3
    per_hop = q_local * k * (2 * F32 + F * F32)
    fwd = n_devices * per_hop
    return fwd * (2 if with_backward else 1)


def mshard_iter_bytes_per_chip(q_local: int, k: int, feat_dim: int,
                               dec_bytes: int, n_devices: int,
                               knn_every: int = 1) -> float:
    """map-shard: one optimizer iteration = ring k-NN (amortized over
    knn_every iterations when the neighbor pool is reused,
    mapping.pixel_pool_factor path) + ring fetch fwd+bwd over the
    sampled points + psum of the REPLICATED grads (decoders only — the
    feature grads stay shard-local, make_map_shard_optimize
    feat_grad_local=True)."""
    return (ring_knn_bytes_per_chip(q_local, k, n_devices) / max(knn_every, 1)
            + ring_fetch_bytes_per_chip(q_local, k, feat_dim, n_devices)
            + allreduce_bytes_per_chip(dec_bytes, n_devices))


def bench_budget(n_devices: int = 8) -> Dict[str, float]:
    """The projected per-mapping-iteration ICI budget at the BENCH shapes
    (synthetic room: 5000 rays/iter × 8 samples/ray, k=8 neighbors,
    c_dim 32 → feat rows 64 lanes, map capacity 2^15, decoders ≈ 0.4 MB)
    and at the FLAGSHIP shapes (same rays, capacity 2^17)."""
    import jax
    import jax.numpy as jnp

    k, c2 = 8, 64
    dec_bytes = 400_000
    out = {}
    for name, cap in (("bench", 2 ** 15), ("flagship", 2 ** 17)):
        samples = 5000 * 8  # rays/iter × samples/ray, split across chips
        q_local = samples // n_devices
        trainable = {
            "feat": jax.ShapeDtypeStruct((cap, c2), jnp.float32),
            "dec": jax.ShapeDtypeStruct((dec_bytes // F32,), jnp.float32),
        }
        out[f"dp_iter_MB_{name}"] = dp_iter_bytes_per_chip(
            trainable, n_devices) / 1e6
        out[f"mshard_iter_MB_{name}"] = mshard_iter_bytes_per_chip(
            q_local, k, c2, dec_bytes, n_devices) / 1e6
    return out
