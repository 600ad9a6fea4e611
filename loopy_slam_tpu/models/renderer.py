"""Fused ray renderer: z-vals -> k-NN -> feature interp -> MLPs -> composite.

TPU-native equivalent of the reference render path
(src/utils/Renderer.py:71-201 + decoder get_feature_at_pos): one jittable
function evaluates a whole ray batch with static shapes. The single k-NN
query is shared by the geometry and color decoders (the reference issues
two identical faiss searches per batch, decoder.py:186 and :437 — same
query points, same radius — so sharing is exact, and halves the hot-path
index traffic).

Gradient routing falls out of JAX autodiff instead of the reference's
is_tracker flag: squared distances are always recomputed differentiably
from gathered neighbor positions (identical values to the faiss distances),
so pose gradients flow through sample positions when the pose is an input
being differentiated, and feature gradients flow through the gathered
features when those are differentiated.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import knn
from ..ops.compositing import composite
from ..ops.sampling import surface_z_vals, pixels_to_points
from .decoder import (
    col_forward,
    exposure_affine,
    geo_forward,
    interp_weights,
    interpolate_features,
    neighbor_transform,
)


class RenderOptions(NamedTuple):
    """Static (hashable) rendering configuration, from the YAML config."""

    n_surface: int = 5
    near_end: float = 0.3
    near_end_surface: float = 0.98
    far_end_surface: float = 1.02
    sigmoid_coef: float = 0.1
    sample_near_pcl: bool = False
    nn_num: int = 8
    min_nn_num: int = 2
    radius_query: float = 0.08
    table_size: int = 2 ** 17
    max_per_cell: int = 16
    weighting: str = "distance"
    c_dim: int = 32
    encode_rel_pos_in_col: bool = True
    use_view_direction: bool = False
    encode_viewd: bool = True
    encode_exposure: bool = False

    @staticmethod
    def from_cfg(cfg, sigmoid_coef=None):
        from ..mapping.point_cloud import effective_cell_and_slots

        _, mpc = effective_cell_and_slots(cfg)
        return RenderOptions(
            n_surface=cfg["rendering"]["N_surface"],
            near_end=cfg["rendering"]["near_end"],
            near_end_surface=cfg["rendering"]["near_end_surface"],
            far_end_surface=cfg["rendering"]["far_end_surface"],
            sigmoid_coef=(sigmoid_coef if sigmoid_coef is not None
                          else cfg["rendering"]["sigmoid_coef_mapper"]),
            sample_near_pcl=cfg["rendering"]["sample_near_pcl"],
            nn_num=cfg["pointcloud"]["nn_num"],
            min_nn_num=cfg["pointcloud"]["min_nn_num"],
            radius_query=cfg["pointcloud"]["radius_query"],
            table_size=cfg["pointcloud"]["cell_table_size"],
            # shared derivation with MapOptions (the grid's build-time
            # value is authoritative at query; deriving both from one
            # helper keeps the configs in agreement by construction)
            max_per_cell=mpc,
            weighting=cfg["pointcloud"]["nn_weighting"],
            c_dim=cfg["model"]["c_dim"],
            encode_rel_pos_in_col=cfg["model"]["encode_rel_pos_in_col"],
            use_view_direction=cfg["use_view_direction"],
            encode_viewd=cfg["model"]["encode_viewd"],
            encode_exposure=cfg["model"]["encode_exposure"],
        )


@jax.custom_vjp
def gather_featpos(feats, map_pos, I):
    """take(concat([feats, map_pos], 1), I.flat) -> (N, k, 2c+3).

    Custom VJP so the backward pass scatter-adds ONLY the feature lanes:
    positions are non-differentiable here (the decode path stop-gradients
    them), and autodiff of the concat+gather would otherwise scatter
    2c+3-wide rows and then slice, paying ~5% extra on the hot-path
    scatter (the single largest fixed cost of a mapping iteration).
    """
    featpos = jnp.concatenate([feats, map_pos], axis=1)
    return jnp.take(featpos, I.reshape(-1), axis=0).reshape(
        I.shape[0], I.shape[1], -1)


def _gather_featpos_fwd(feats, map_pos, I):
    return gather_featpos(feats, map_pos, I), (I, feats.shape, map_pos.shape)


def _gather_featpos_bwd(res, g):
    I, fshape, pshape = res
    c2 = fshape[1]
    dfeats = jnp.zeros(fshape, g.dtype).at[I.reshape(-1)].add(
        g[..., :c2].reshape(-1, c2))
    return dfeats, jnp.zeros(pshape, g.dtype), None


gather_featpos.defvjp(_gather_featpos_fwd, _gather_featpos_bwd)


def eval_points(params, map_pos, grid, feats, pts, key,
                opts: RenderOptions, stage: str, views_d=None,
                r_query=None, exposure_feat=None):
    """Decode occupancy (and color) at arbitrary sample positions (N, 3).

    feats is the packed (cap, 2c) [geometry || color] feature buffer: both
    decoders share ONE neighbor gather (and one scatter-add in the backward
    pass) — random row access dominates render time on TPU.

    Returns (occ_logits(N,), rgb(N,3), has_neighbors(N,)).
    rgb is post-sigmoid unless encode_exposure with exposure_feat=None (the
    mapper's deferred-exposure path, reference Mapper.py:696-715).
    """
    rq = opts.radius_query if r_query is None else r_query
    D_idx, I, nn_count = knn.query(
        grid, map_pos, jax.lax.stop_gradient(pts), opts.nn_num, rq,
        opts.table_size, opts.max_per_cell)
    # ONE gather serves both decoders AND the neighbor positions: the
    # packed [geometry || color || xyz] table is a cheap concat (~0.06 ms
    # at cap=2^17) while a separate position gather would cost another
    # ~0.6 ms of row-granular HBM traffic. FLAT index form — XLA lowers
    # the (N, k) 2-d gather ~2.5x slower than the same gather flattened
    # (measured 1.43 vs 0.58 ms at N=25k on a v5e).
    both = gather_featpos(feats, jax.lax.stop_gradient(map_pos), I)
    return decode_neighbors(params, pts, key, opts, stage, D_idx, both,
                            nn_count, rq, views_d, exposure_feat)


def decode_neighbors(params, pts, key, opts: RenderOptions, stage: str,
                     D_idx, both, nn_count, rq, views_d=None,
                     exposure_feat=None):
    """Decode occupancy/color from already-fetched neighbor data.

    Split out of eval_points so multi-chip neighbor providers (the
    map-sharded ring fetch in parallel/map_shard.py) reuse the exact
    single-chip decode semantics. `both` is the gathered
    (N, k, 2c + 3) [geo feats || color feats || position] block; `D_idx`
    the index-structure distances (only thresholded, never
    differentiated); distances are recomputed differentiably from the
    gathered positions.
    """
    n = pts.shape[0]
    c = opts.c_dim
    kg, kc = jax.random.split(key)
    geo_n, col_n = both[..., :c], both[..., c:2 * c]
    neighbor_pos = jax.lax.stop_gradient(both[..., 2 * c:])
    diff = neighbor_pos - pts[:, None, :]
    D = jnp.sum(diff * diff, axis=-1)
    # empty candidate slots -> out-of-radius marker (reference uses 1e4,
    # decoder.py:198); empties gather row 0's position, which the D_idx
    # mask discards
    D = jnp.where(D_idx < 1e9, D, 1e4)

    r2_bound = (jnp.asarray(rq) ** 2)
    if r2_bound.ndim == 1:
        r2_bound = r2_bound[:, None]
    w = interp_weights(D, r2_bound, opts.weighting)
    has_neighbors = nn_count >= opts.min_nn_num
    c_geo = interpolate_features(geo_n, w, has_neighbors, kg, opts.c_dim)
    occ = geo_forward(params["geo"], pts, c_geo)
    occ = jnp.where(has_neighbors, occ, -100.0)

    if stage == "geometry":
        return occ, jnp.zeros((n, 3), pts.dtype), has_neighbors

    if opts.encode_rel_pos_in_col:
        rel = neighbor_pos - pts[:, None, :]
        col_n = neighbor_transform(params["col"], col_n, rel)
    c_col = interpolate_features(col_n, w, has_neighbors, kc, opts.c_dim)
    rgb = col_forward(params["col"], pts, c_col, views_d,
                      opts.use_view_direction, opts.encode_viewd)
    if opts.encode_exposure:
        if exposure_feat is not None:
            rot, trans = exposure_affine(params["col"], exposure_feat)
            rgb = jax.nn.sigmoid(soft_clamp_logits(rgb @ rot + trans))
        # else: defer exposure+sigmoid to the caller (mapper color stage)
    else:
        rgb = jax.nn.sigmoid(soft_clamp_logits(rgb))
    return occ, rgb, has_neighbors


_CLAMP_LIMIT = 12.0
_CLAMP_KNEE = 24.0  # fold point: well past any logit a real color needs


def soft_clamp_logits(x):
    """Bound pre-sigmoid color logits with a rational clamp that FOLDS
    BACK past |x| = 24.

    Robustness addition over the reference (two failure modes observed on
    a v5e, both absent from the CUDA reference's bare sigmoid head only
    because it starts from pretrained decoders):

    1. LATCH. Under the L1 color loss, Adam can transiently drive logits
       to the hundreds (within 50 color iterations every sample railed to
       (1, 0, 0)), where sigmoid'(x) — and tanh'(x/L) of a tanh clamp —
       underflow to EXACT f32 zero: zero gradient, zero Adam update, the
       head latches permanently grey/railed. Inside |x| <= 24 this uses
       x / (1 + |x|/L): output in (-8, 8], derivative decays only
       polynomially, every 8-bit color optimum reachable at finite x.

    2. DRIFT. A monotone clamp's flat-but-sign-consistent tail gradient
       is itself a trap: Adam is magnitude-invariant, so pixels railed at
       exact 0/1 targets (decoded JPEG hits them) walk the color trunk at
       full lr forever — measured +-1e7 logits after 340k iterations on
       the room0-format run. Past |x| = 24 the output therefore DECLINES
       (rationally, saturating at 8 - 24 = -16): "more saturated" stops
       being representable, so the task loss itself rises beyond the fold
       and pulls the weights back — the restoring gradient arrives
       through the ordinary loss pathway at task-gradient scale (no
       hand-tuned penalty to fight Adam's second-moment estimate), and
       sigmoid' stays alive on the whole fold branch (output >= -16).
       A weight parked on the far branch still renders its correct color
       (the fold makes the map two-to-one, deliberately). Targets are
       additionally clipped to the 8-bit band in mapper._map_loss so L1
       optima sit at finite logits in the first place.
    """
    a = jnp.abs(x)
    core = x / (1.0 + a / _CLAMP_LIMIT)
    k_val = _CLAMP_KNEE / (1.0 + _CLAMP_KNEE / _CLAMP_LIMIT)      # = 8
    slope = 1.0 / (1.0 + _CLAMP_KNEE / _CLAMP_LIMIT) ** 2         # = 1/9
    span = 2.0 * _CLAMP_LIMIT                                     # = 24
    excess = jnp.maximum(a - _CLAMP_KNEE, 0.0)
    decline = span * excess / (excess + span / slope)   # (0, 24), slope 1/9
    return jnp.where(a <= _CLAMP_KNEE, core,
                     jnp.sign(x) * (k_val - decline))


def render_batch_ray(params, map_pos, grid, feats,
                     rays_o, rays_d, gt_depth, ray_valid, key,
                     opts: RenderOptions, stage: str,
                     r_query=None, exposure_feat=None,
                     z_vals_override=None, eval_fn=None):
    """Render a fixed-size batch of rays.

    Args mirror reference Renderer.render_batch_ray (Renderer.py:71-201),
    with `ray_valid` carrying what the reference expressed via boolean
    compaction. `r_query` is a scalar or per-ray radius (dynamic radius).
    `z_vals_override` lets the caller substitute sample-near-pcl z-vals for
    zero-depth rays.

    `eval_fn(pts, key, stage, views_d, rq, exposure_feat)` overrides the
    sample-decode step — the map-sharded path (parallel/map_shard.py)
    injects a ring-collective k-NN + fetch here while everything around it
    (z-vals, compositing, validity) stays the single-chip code. When set,
    map_pos/grid/feats may be the LOCAL shard's arrays and are only touched
    by the sample_near_pcl probe path (unsupported sharded; must be off).

    Returns (depth, depth_var, color, valid_ray_mask) each (R, ...).
    """
    R = rays_o.shape[0]
    S = opts.n_surface
    z_vals = surface_z_vals(gt_depth, ray_valid, S, opts.near_end_surface,
                            opts.far_end_surface, opts.near_end)
    mask_rays_near_pcl = jnp.ones((R,), bool)
    if opts.sample_near_pcl and z_vals_override is None:
        # an injected eval_fn (map-sharded path) must carry a GLOBAL
        # occupancy probe as its `probe_occupied` attribute — the local
        # grid holds only this shard's cells
        probe = (None if eval_fn is None
                 else getattr(eval_fn, "probe_occupied", None))
        assert eval_fn is None or probe is not None, (
            "sample_near_pcl with an injected eval_fn needs "
            "eval_fn.probe_occupied (global occupancy probe); the "
            "map-sharded builder attaches one")
        # zero-depth rays sample where the point cloud actually lies
        # (Renderer.py:151-160 + neural_point.sample_near_pcl); rays with
        # <2 occupied probe depths are flagged invalid
        from ..ops.masked import masked_max
        from ..mapping.point_cloud import sample_near_pcl_z_vals_raw

        far = jnp.maximum(masked_max(
            z_vals[:, -1], ray_valid & (gt_depth > 0), fill=0.0), 1.0)
        # probe with DETACHED rays (reference Renderer.py:153 clones +
        # detaches before npc.sample_near_pcl): z-vals carry no pose
        # tangent, and the index query's selection kernel has no JVP rule
        z_near, invalid = sample_near_pcl_z_vals_raw(
            map_pos, grid, jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d), opts.near_end,
            jax.lax.stop_gradient(far), S,
            opts.radius_query, opts.nn_num, opts.table_size,
            opts.max_per_cell, occupied_fn=probe)
        z_vals_override = z_near
        mask_rays_near_pcl = jnp.where(gt_depth > 0, True, ~invalid)
    if z_vals_override is not None:
        z_vals = jnp.where((gt_depth > 0)[:, None], z_vals, z_vals_override)
    pts = pixels_to_points(rays_o, rays_d, z_vals).reshape(-1, 3)

    views_d = None
    if opts.use_view_direction:
        views_d = jnp.repeat(rays_d, S, axis=0)
    rq = None
    if r_query is not None:
        rq = jnp.repeat(jnp.asarray(r_query).reshape(-1), S, axis=0)

    if eval_fn is None:
        occ, rgb, has_neighbors = eval_points(
            params, map_pos, grid, feats, pts, key, opts, stage,
            views_d=views_d, r_query=rq, exposure_feat=exposure_feat)
    else:
        occ, rgb, has_neighbors = eval_fn(pts, key, stage, views_d, rq,
                                          exposure_feat)

    valid_ray = (
        jnp.sum(has_neighbors.reshape(R, S), axis=-1) >= (S // 2 + 1)
    ) & mask_rays_near_pcl
    depth, depth_var, color, _ = composite(
        rgb.reshape(R, S, 3), occ.reshape(R, S), z_vals, opts.sigmoid_coef)
    if not opts.sample_near_pcl:
        depth = jnp.where(gt_depth > 0, depth, 0.0)
    return depth, depth_var, color, valid_ray
