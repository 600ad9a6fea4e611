"""Multi-chip execution: rays sharded over the mesh, map replicated,
gradients reduced over ICI.

The reference's only concurrency is OS processes on one GPU (SURVEY.md
§2.4); there is no multi-device path to port. This module is the TPU-native
scale-out design: the ray batch (the embarrassingly parallel axis of both
tracking and mapping) is sharded across a 1-D device mesh axis "rays";
decoder parameters, feature buffers and the hash-grid index are replicated;
loss terms and parameter gradients are combined with jax.lax.psum so every
chip applies an identical optimizer update. Rays never need neighbor
exchange (each ray's k-NN reads the replicated map), so the only
collectives are the gradient psums riding ICI.

Scaling the map itself (sharding the point buffer by spatial cell across
chips with ring-gathered candidate cells) is the planned next step for
scenes exceeding one chip's HBM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapping.mapper import MapperOptions, _map_loss
from ..models.renderer import RenderOptions, render_batch_ray
from ..ops import adam

AXIS = "rays"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_rays(mesh: Mesh, *arrays):
    """Place ray-major arrays with their leading axis split over the mesh."""
    out = []
    for a in arrays:
        spec = P(AXIS) if a.ndim == 1 else P(AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_train_step(mesh: Mesh, mopts: MapperOptions,
                            ropts: RenderOptions, pix_per_frame: int):
    """Build a pjit'ed mapping train step: one optimizer step over a window
    of keyframes with rays data-parallel across the mesh.

    Returns step(trainable, adam_state, dec_mask, feat_mask, map_pos, grid,
                 kf_color, kf_depth, kf_c2w, key, lrs) -> (trainable, state,
                 loss). kf_* are replicated; the per-frame pixel sampling
    happens inside, sharded by folding the device index into the RNG key.
    """
    shard_map = jax.shard_map

    local_pix = max(pix_per_frame // mesh.devices.size, 1)

    def local_loss(trainable, map_pos, grid, kf_color, kf_depth, kf_c2w,
                   key, stage):
        ax = jax.lax.axis_index(AXIS)
        key = jax.random.fold_in(key, ax)
        loss, aux = _map_loss(trainable, None, map_pos, grid, kf_color,
                              kf_depth, kf_c2w, None, key, stage, mopts,
                              ropts, local_pix)
        return loss, aux

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def _step(trainable, st, dec_mask, feat_mask, map_pos, grid,
              kf_color, kf_depth, kf_c2w, key, lrs):
        grad_fn = jax.value_and_grad(local_loss, has_aux=True)
        (loss, _aux), g = grad_fn(trainable, map_pos, grid, kf_color,
                                  kf_depth, kf_c2w, key, "color")
        g = jax.lax.psum(g, AXIS)
        loss = jax.lax.psum(loss, AXIS)
        fm = feat_mask[:, None].astype(jnp.float32)
        g = {"dec": jax.tree.map(lambda x, m: x * m, g["dec"], dec_mask),
             "feat": g["feat"] * fm}
        c = trainable["feat"].shape[1] // 2
        lr_feat = jnp.concatenate([jnp.full((c,), lrs[1]),
                                   jnp.full((c,), lrs[2])])
        lr_tree = {"dec": jax.tree.map(lambda _: lrs[0], trainable["dec"]),
                   "feat": lr_feat}
        trainable, st = adam.update(trainable, g, st, lr_tree)
        return trainable, st, loss

    return jax.jit(_step)


def make_sharded_optimize_map(mesh: Mesh, opts: MapperOptions,
                              ropts: RenderOptions, pix_per_frame: int,
                              use_dynamic_radius: bool = False):
    """The FULL staged mapping optimizer (mapper._optimize_map_impl:
    geometry->color phases, chunked fori_loop, BA/exposure support) run
    data-parallel over the mesh: every device samples its own
    pix_per_frame/n rays per keyframe, gradients and loss terms are
    psummed over ICI inside the loop body, and the replicated Adam update
    is identical on all devices. Call signature matches
    mapper.optimize_map (inputs must be replicated on the mesh — see
    `replicate`).

    This is what slam.map_frame uses when parallel.n_devices > 1.
    """
    from ..mapping.mapper import _optimize_map_impl

    n = mesh.devices.size
    local_pix = max(pix_per_frame // n, 1)
    impl = partial(_optimize_map_impl, opts=opts, ropts=ropts,
                   pix_per_frame=local_pix,
                   use_dynamic_radius=use_dynamic_radius,
                   psum_axis=AXIS)

    def _wrapped(trainable, adam_state, dec_mask, feat_mask, map_pos, grid,
                 kf_color, kf_depth, kf_c2w, kf_rq, key, n_geo, n_col,
                 lrs_geo, lrs_col, kf_exposure, ba_row_mask, ba_lr,
                 ba_window, iter_offset):
        # BA rides along unchanged: trainable["cams"] is replicated and its
        # gradient is part of the same per-iteration psum as the decoders'
        return impl(trainable, adam_state, dec_mask, feat_mask, map_pos,
                    grid, kf_color, kf_depth, kf_c2w, kf_rq, key, n_geo,
                    n_col, lrs_geo, lrs_col, kf_exposure=kf_exposure,
                    ba_row_mask=ba_row_mask, ba_lr=ba_lr,
                    ba_window=ba_window, iter_offset=iter_offset)

    sharded = jax.shard_map(_wrapped, mesh=mesh,
                        in_specs=(P(),) * 20, out_specs=(P(), P(), P()),
                        check_vma=False)
    return jax.jit(sharded, donate_argnames=("trainable", "adam_state"))


def make_sharded_render(mesh: Mesh, ropts: RenderOptions):
    """pjit'ed batch renderer with rays sharded over the mesh (used for
    full-image eval renders and the throughput benchmark)."""

    @partial(jax.jit, static_argnames=())
    def render(params, map_pos, grid, feats, rays_o, rays_d, gt_depth,
               key):
        valid = gt_depth > 0
        return render_batch_ray(params, map_pos, grid, feats,
                                rays_o, rays_d, gt_depth, valid, key,
                                ropts, "color")

    def run(params, map_pos, grid, feats, rays_o, rays_d, gt_depth, key):
        rays_o, rays_d, gt_depth = shard_rays(mesh, rays_o, rays_d, gt_depth)
        reps = replicate(mesh, (params, map_pos, grid, feats))
        return render(*reps, rays_o, rays_d, gt_depth, key)

    return run
