"""Camera tracking: one jit-compiled pose-optimization loop per frame.

Re-design of the reference Tracker (src/Tracker.py:102-424). The reference
runs `iters` Python iterations, each dispatching a fresh autograd graph and
several RPC round-trips to the point-cloud server; here the entire loop —
pixel sampling, rendering, loss, Adam on the pose 7-vector, min-loss
candidate tracking — is a single lax.fori_loop inside one XLA program, so
per-iteration overhead is zero and the chip stays busy.

Loss parity (Tracker.py:153-195):
  inside gate:  gt_depth <= min(10*median, 1.2*max)          (:153-160)
  dynamic gate: |gt-d|/sqrt(var) < 10*mean (handle_dynamic)  (:174-179)
  geo loss:     sum clamp(|gt-d|/sqrt(var+1e-10), 0, 1e3)    (:183-184)
  color loss:   sum |gt_c - c|; total = geo + w_color*color  (:187-191)
Separate LRs: translation lr, quaternion lr*0.2 (:327-328).
The candidate kept is the post-step pose whose pre-step loss was minimal
(:375-377, torch Adam steps in place before the comparison).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.renderer import RenderOptions, render_batch_ray
from ..ops import adam
from ..ops.masked import masked_mean, masked_median
from ..ops.sampling import inside_mask_from_depth, sample_rays


class TrackOptions(NamedTuple):
    """Static tracking configuration (hashable)."""

    pixels: int = 200
    iters: int = 20
    lr: float = 0.002
    separate_LR: bool = True
    w_color_loss: float = 0.5
    use_color_in_tracking: bool = True
    handle_dynamic: bool = True
    depth_limit: bool = False
    ignore_edge_W: int = 20
    ignore_edge_H: int = 20
    encode_exposure: bool = False
    H: int = 680
    W: int = 1200
    fx: float = 600.0
    fy: float = 600.0
    cx: float = 599.5
    cy: float = 339.5
    knn_refresh: int = 10
    pool_factor: int = 4
    health_gate: float = 0.0
    health_freeze: float = 1.5
    health_streak: int = 10

    @staticmethod
    def from_cfg(cfg):
        t = cfg["tracking"]
        cam = cfg["cam"]
        e = cam["crop_edge"] or 0
        return TrackOptions(
            pixels=t["pixels"], iters=t["iters"], lr=t["lr"],
            separate_LR=t["separate_LR"], w_color_loss=t["w_color_loss"],
            use_color_in_tracking=t["use_color_in_tracking"],
            handle_dynamic=t["handle_dynamic"], depth_limit=t["depth_limit"],
            ignore_edge_W=t["ignore_edge_W"], ignore_edge_H=t["ignore_edge_H"],
            encode_exposure=cfg["model"]["encode_exposure"],
            H=cam["H"] - 2 * e, W=cam["W"] - 2 * e,
            fx=cam["fx"], fy=cam["fy"],
            cx=cam["cx"] - e, cy=cam["cy"] - e,
            knn_refresh=int(t.get("knn_refresh", 10)),
            pool_factor=max(1, int(t.get("pool_factor", 4))),
            health_gate=float(t.get("health_gate_factor", 0.0)),
            health_freeze=float(t.get("health_ema_freeze", 1.5)),
            health_streak=int(t.get("health_reject_streak", 10)),
        )


def _lr_vector(opts: TrackOptions) -> jnp.ndarray:
    if opts.separate_LR:
        return jnp.array([opts.lr * 0.2] * 4 + [opts.lr] * 3, jnp.float32)
    return jnp.full((7,), opts.lr, jnp.float32)


def tracking_loss(opt_vars, params, map_pos, grid, feats,
                  gt_color, gt_depth, key, opts: TrackOptions,
                  ropts: RenderOptions, sel_i=None, sel_j=None, r_query=None,
                  eval_fn_builder=None):
    """Sample pixels, render, compute the tracking loss.

    opt_vars: {"cam": pose 7-vector} plus, with encode_exposure,
    {"exp_feat": (8,), "exp_mlp": exposure-MLP params} (the reference adds
    both to the camera optimizer at lr 0.001, Tracker.py:329-344)."""
    from ..ops.camera import c2w_from_tensor, rays_from_uv

    cam7 = opt_vars["cam"]
    exposure_feat = None
    if opts.encode_exposure:
        params = {**params, "col": {**params["col"],
                                    "exposure": opt_vars["exp_mlp"]}}
        exposure_feat = opt_vars["exp_feat"]
    c2w = c2w_from_tensor(cam7)
    ks, kr = jax.random.split(key)
    if sel_i is not None:
        # pre-selected color-gradient pixels (sample_with_color_grad path,
        # Tracker.py:126-139): choose `pixels` of them at random
        pick = jax.random.randint(ks, (opts.pixels,), 0, sel_i.shape[0])
        i = sel_i[pick].astype(jnp.float32)
        j = sel_j[pick].astype(jnp.float32)
        rays_o, rays_d = rays_from_uv(i, j, c2w, opts.fx, opts.fy,
                                      opts.cx, opts.cy)
        ii, jj = i.astype(jnp.int32), j.astype(jnp.int32)
        d, c = gt_depth[jj, ii], gt_color[jj, ii]
        valid = d > 0
        if opts.depth_limit:
            valid = valid & (d < 5.0)
    else:
        rays_o, rays_d, d, c, valid, ii, jj = sample_rays(
            ks, opts.ignore_edge_H, opts.H - opts.ignore_edge_H,
            opts.ignore_edge_W, opts.W - opts.ignore_edge_W,
            opts.pixels, c2w, gt_depth, gt_color,
            opts.fx, opts.fy, opts.cx, opts.cy,
            depth_limit=5.0 if opts.depth_limit else None)
    rq = None if r_query is None else r_query[jj, ii]
    inside = inside_mask_from_depth(d, valid) & valid

    eval_fn = (None if eval_fn_builder is None
               else eval_fn_builder(params, feats))
    depth, var, color, _ = render_batch_ray(
        params, map_pos, grid, feats, rays_o, rays_d, d,
        inside, kr, ropts, "color", r_query=rq,
        exposure_feat=exposure_feat, eval_fn=eval_fn)

    var = jax.lax.stop_gradient(var)
    nan_mask = jnp.isfinite(depth) & jnp.isfinite(var)
    tmp = jnp.abs(d - depth) / jnp.sqrt(var + 1e-10)
    if opts.handle_dynamic:
        gate = tmp < 10.0 * masked_mean(tmp, inside)
    else:
        gate = jnp.abs(d - depth) < 10.0 * masked_median(jnp.abs(d - depth),
                                                         inside)
    mask = gate & (d > 0) & nan_mask & inside

    geo = jnp.sum(jnp.where(mask, jnp.clip(tmp, 0.0, 1e3), 0.0))
    col = jnp.sum(jnp.where(mask[:, None], jnp.abs(c - color), 0.0))
    loss = geo + (opts.w_color_loss * col if opts.use_color_in_tracking else 0.0)
    return loss, (geo, col, jnp.sum(mask))


def _build_track_cache(cam7, map_pos, grid, feats, gt_color, gt_depth, key,
                       opts: TrackOptions, ropts: RenderOptions,
                       si=None, sj=None, r_query=None):
    """Per-refresh-block tracking POOL: a pool_factor*pixels ray pool with
    z-vals, neighbor ids and gathered neighbor features computed once.

    During tracking the map (positions + features) is FIXED — only the pose
    moves, and it moves sub-millimeter per Adam step. So for a block of
    knn_refresh iterations: sample a POOL of pool_factor*pixels pixels, run
    the k-NN once at the block-start pose over all pool samples, and gather
    the neighbor [features || position] rows once. Each iteration draws a
    FRESH `pixels`-subset from the pool (uniform with replacement),
    recomputes sample positions from the CURRENT pose and re-derives
    distances/weights differentiably from the cached neighbor positions
    (exactly what decode_neighbors does) — the index query, candidate
    selection and HBM row gather amortize to ~pool_factor/knn_refresh of an
    exact iteration's cost while every iteration still sees a fresh pixel
    batch (fresh loss-gate statistics, decorrelated SGD noise). The round-2
    design froze ONE `pixels` batch per block, which collapsed a
    40-iteration frame to 4 distinct batches and regressed bench ATE 7x
    (BENCH_r01 vs BENCH_r02); the pool restores per-iteration sampling
    parity with the reference (Tracker.py:361-401) up to neighbor-set
    staleness, which is bounded by pose motion within a block and resets
    every refresh.
    """
    from ..ops import knn
    from ..ops.camera import c2w_from_tensor, rays_from_uv
    from ..ops.sampling import sample_pixels, surface_z_vals
    from ..models.renderer import gather_featpos

    P = opts.pixels * opts.pool_factor
    c2w = c2w_from_tensor(cam7)
    if si is not None:
        pick = jax.random.randint(key, (P,), 0, si.shape[0])
        i = si[pick].astype(jnp.float32)
        j = sj[pick].astype(jnp.float32)
        ii, jj = i.astype(jnp.int32), j.astype(jnp.int32)
        d, c = gt_depth[jj, ii], gt_color[jj, ii]
    else:
        i, j, d, c = sample_pixels(
            key, opts.ignore_edge_H, opts.H - opts.ignore_edge_H,
            opts.ignore_edge_W, opts.W - opts.ignore_edge_W,
            P, gt_depth, gt_color)
        ii, jj = i.astype(jnp.int32), j.astype(jnp.int32)
    valid = d > 0
    if opts.depth_limit:
        valid = valid & (d < 5.0)
    rq = None if r_query is None else r_query[jj, ii]
    inside = inside_mask_from_depth(d, valid) & valid
    S = ropts.n_surface
    z = surface_z_vals(d, inside, S, ropts.near_end_surface,
                       ropts.far_end_surface, ropts.near_end)
    rays_o, rays_d = rays_from_uv(i, j, c2w, opts.fx, opts.fy,
                                  opts.cx, opts.cy)
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
           ).reshape(-1, 3)
    rq_s = (ropts.radius_query if rq is None
            else jnp.repeat(rq, S, axis=0))
    # chunked: the pool is pixels*pool_factor*S queries (100k at TUM
    # settings); unchunked, the stencil-row gather temp scales as
    # Q*27*M*4 lanes and compile-OOMs once the grid's row capacity has
    # adaptively escalated (knn.query_chunked docstring)
    D, I, nn = knn.query_chunked(grid, map_pos, pts, ropts.nn_num, rq_s,
                                 ropts.table_size, ropts.max_per_cell)
    both = gather_featpos(feats, map_pos, I)
    k = ropts.nn_num
    return {"i": i, "j": j, "d": d, "c": c, "inside": inside, "z": z,
            "rq": rq, "D": D.reshape(P, S * k),
            "both": both.reshape(P, S * k, -1), "nn": nn.reshape(P, S)}


def tracking_loss_cached(opt_vars, params, cache, key, opts: TrackOptions,
                         ropts: RenderOptions):
    """tracking_loss with the k-NN + feature gather served from the block
    pool; a fresh `pixels` subset is drawn per iteration and only
    pose-dependent quantities are recomputed."""
    from ..models.renderer import decode_neighbors
    from ..ops.camera import c2w_from_tensor, rays_from_uv
    from ..ops.compositing import composite

    cam7 = opt_vars["cam"]
    exposure_feat = None
    if opts.encode_exposure:
        params = {**params, "col": {**params["col"],
                                    "exposure": opt_vars["exp_mlp"]}}
        exposure_feat = opt_vars["exp_feat"]
    c2w = c2w_from_tensor(cam7)
    S, k = ropts.n_surface, ropts.nn_num
    R = opts.pixels
    P = cache["d"].shape[0]
    kpick, key = jax.random.split(key)
    pick = jax.random.randint(kpick, (R,), 0, P)

    def take(a):
        return jnp.take(a, pick, axis=0)

    d, c, inside, z = (take(cache["d"]), take(cache["c"]),
                       take(cache["inside"]), take(cache["z"]))
    D_idx = take(cache["D"]).reshape(R * S, k)
    both = take(cache["both"]).reshape(R * S, k, -1)
    nn = take(cache["nn"]).reshape(R * S)
    rays_o, rays_d = rays_from_uv(take(cache["i"]), take(cache["j"]), c2w,
                                  opts.fx, opts.fy, opts.cx, opts.cy)
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
           ).reshape(-1, 3)
    views_d = (jnp.repeat(rays_d, S, axis=0)
               if ropts.use_view_direction else None)
    rq = (ropts.radius_query if cache["rq"] is None
          else jnp.repeat(take(cache["rq"]), S, axis=0))
    occ, rgb, _has = decode_neighbors(
        params, pts, key, ropts, "color", D_idx, both,
        nn, rq, views_d=views_d, exposure_feat=exposure_feat)
    depth, var, color, _ = composite(
        rgb.reshape(R, S, 3), occ.reshape(R, S), z, ropts.sigmoid_coef)
    depth = jnp.where(d > 0, depth, 0.0)

    var = jax.lax.stop_gradient(var)
    nan_mask = jnp.isfinite(depth) & jnp.isfinite(var)
    tmp = jnp.abs(d - depth) / jnp.sqrt(var + 1e-10)
    if opts.handle_dynamic:
        gate = tmp < 10.0 * masked_mean(tmp, inside)
    else:
        gate = jnp.abs(d - depth) < 10.0 * masked_median(jnp.abs(d - depth),
                                                         inside)
    mask = gate & (d > 0) & nan_mask & inside

    geo = jnp.sum(jnp.where(mask, jnp.clip(tmp, 0.0, 1e3), 0.0))
    col = jnp.sum(jnp.where(mask[:, None], jnp.abs(c - color), 0.0))
    loss = geo + (opts.w_color_loss * col
                  if opts.use_color_in_tracking else 0.0)
    return loss, (geo, col, jnp.sum(mask))


def _apply_health_gate(health, best_loss, best_nm, cam7_init, best_cam,
                       opts: "TrackOptions", total_px=None):
    """Tracking health gate: decide whether to accept the optimized pose
    and update the gate state. Returns (out_cam7, health').

    health is [loss EMA, total rejects, consecutive-reject streak]
    (a legacy (2,) vector is padded with streak=0). Two failure
    signatures reject a frame (keep the motion-model pose cam7_init):
    (a) per-masked-pixel loss above health_gate x the healthy EMA — the
    optimizer converged somewhere photometrically wrong; (b) mask-support
    collapse (under 5% of rays survive the gates) — the "optimum" is
    unconstrained noise. The EMA only updates on frames within
    health_freeze x of itself (creep immunity, BASELINE.md r4 replay).

    Reject-streak escape hatch: a frozen EMA has no upward path, so a
    legitimate sustained loss shift (entering a poorly-mapped area, an
    exposure change) could otherwise pin every subsequent pose to the
    motion model forever against a stale baseline. After health_streak
    consecutive loss-rejects with healthy ray support, accept the
    optimized pose and re-seed the EMA at this frame's level.
    Support-collapse rejects never escape."""
    if health.shape[0] == 2:  # pre-streak checkpoints / callers
        health = jnp.concatenate([health, jnp.zeros((1,))])
    ema, nrej, streak = health[0], health[1], health[2]
    best_nm = best_nm.astype(jnp.float32)
    mean_best = best_loss / jnp.maximum(best_nm, 1.0)
    if total_px is None:
        total_px = jnp.float32(opts.pixels)
    bad_loss = (ema > 0) & (mean_best > opts.health_gate * ema)
    bad_support = best_nm < 0.05 * total_px
    unhealthy = (opts.health_gate > 0) & (bad_loss | bad_support)
    escape = (opts.health_streak > 0) & unhealthy & ~bad_support \
        & (streak >= opts.health_streak - 1)
    unhealthy = unhealthy & ~escape
    # the streak counts CONSECUTIVE loss-rejects only: a support-collapse
    # reject resets it (and never escapes) — otherwise N-1 collapse
    # frames followed by one photometrically-wrong convergence would
    # fire the hatch immediately and re-seed the EMA at the bad level
    streak_reject = unhealthy & ~bad_support
    out_cam = jnp.where(unhealthy, cam7_init, best_cam)
    healthy_update = mean_best <= opts.health_freeze * ema
    ema_new = jnp.where(
        unhealthy, ema,
        jnp.where(escape, mean_best,
                  jnp.where(ema > 0,
                            jnp.where(healthy_update,
                                      0.95 * ema + 0.05 * mean_best,
                                      ema),
                            mean_best)))
    streak_new = jnp.where(streak_reject, streak + 1.0, 0.0)
    health_out = jnp.stack([ema_new,
                            nrej + unhealthy.astype(jnp.float32),
                            streak_new])
    return out_cam, health_out


def _track_frame_impl(params, map_pos, grid, feats,
                      gt_color, gt_depth, cam7_init, key,
                      opts: TrackOptions, ropts: RenderOptions,
                      sel_i=None, sel_j=None, r_query=None,
                      use_selected=False, exposure_feat=None,
                      psum_axis=None, eval_fn_builder=None, health=None):
    """Optimize the camera pose (and exposure, if enabled) for one frame.
    Returns (best_cam7, best_c2w44, first_loss, best_loss,
    exposure_feat', exp_mlp', health').

    psum_axis: run inside shard_map with pixels data-parallel — each device
    samples its own opts.pixels rays (keys decorrelated by axis index),
    loss/gradients are psummed so the replicated Adam update is identical
    everywhere. eval_fn_builder reroutes the sample decode to the
    map-sharded ring k-NN (parallel/map_shard.py).

    health: optional (2,) device vector [ema_mean_loss, n_rejected] for the
    tracking health gate (opts.health_gate > 0). The gate compares the
    frame's best per-masked-pixel loss against an EMA over healthy frames;
    a frame whose loss exceeds health_gate * ema REJECTS the optimized pose
    and keeps the motion-model initialization — failure containment for
    degenerate stretches (a planar/texture-aliased view can pull the pose
    to a stable photometric alias; observed as a ~20 cm slide over 14
    frames at full scale, where per-frame loss grew ~10x while GT motion
    stayed at 0.3 cm/frame). The EMA is frozen on rejected frames, so a
    runaway loss cannot drag the gate up with it. All state stays on
    device — no extra host round trips on the tracking hot path."""
    lr_cam = _lr_vector(opts)
    grad_fn = jax.value_and_grad(tracking_loss, has_aux=True)
    si = sel_i if use_selected else None
    sj = sel_j if use_selected else None

    opt_vars = {"cam": cam7_init}
    lr_tree = {"cam": lr_cam}
    if opts.encode_exposure:
        ef = (exposure_feat if exposure_feat is not None
              else jnp.zeros((params["col"]["exposure"]["w1"].shape[0],)))
        opt_vars["exp_feat"] = ef
        opt_vars["exp_mlp"] = params["col"]["exposure"]
        lr_tree["exp_feat"] = 0.001
        lr_tree["exp_mlp"] = jax.tree.map(lambda _: 0.001,
                                          params["col"]["exposure"])

    use_cache = (opts.knn_refresh > 0 and eval_fn_builder is None
                 and not ropts.sample_near_pcl)
    init = (opt_vars, adam.init(opt_vars), jnp.inf, cam7_init,
            jnp.zeros(()), jnp.zeros(()), key)

    if use_cache:
        # warmup block schedule: the first cache is built at the motion-
        # model pose, which is the FURTHEST from the optimum the pose ever
        # is — neighbor-set staleness is worst exactly there. Short blocks
        # early (2, 4, 8 iters), then full knn_refresh blocks: the extra
        # 1-2 pool builds cost ~1 exact iteration while removing most of
        # the cached path's ATE cost (measured on the 31-frame bench).
        refresh = opts.knn_refresh
        lengths = []
        left = opts.iters
        blk_len = 2
        while left > 0:
            take_n = min(blk_len, refresh, left)
            lengths.append(take_n)
            left -= take_n
            blk_len *= 2
        n_blocks = len(lengths)
        lengths_arr = jnp.asarray(lengths, jnp.int32)
        grad_fn_c = jax.value_and_grad(tracking_loss_cached, has_aux=True)

        def outer(blk, carry):
            opt_vars, st, best_loss, best_cam, best_nm, first_loss, k = carry
            k, kblk = jax.random.split(k)
            if psum_axis is not None:
                kblk = jax.random.fold_in(kblk,
                                          jax.lax.axis_index(psum_axis))
            cache = _build_track_cache(
                opt_vars["cam"], map_pos, grid, feats, gt_color, gt_depth,
                kblk, opts, ropts, si, sj, r_query)

            def body(it_in, carry2):
                (opt_vars, st, best_loss, best_cam, best_nm, first_loss,
                 k2) = carry2
                k2, kiter = jax.random.split(k2)
                if psum_axis is not None:
                    kiter = jax.random.fold_in(
                        kiter, jax.lax.axis_index(psum_axis))
                (loss, aux), g = grad_fn_c(opt_vars, params, cache, kiter,
                                           opts, ropts)
                n_mask = aux[2]
                if psum_axis is not None:
                    g = jax.lax.psum(g, psum_axis)
                    loss = jax.lax.psum(loss, psum_axis)
                    n_mask = jax.lax.psum(n_mask, psum_axis)
                opt_vars, st = adam.update(opt_vars, g, st, lr_tree)
                better = loss < best_loss
                best_loss = jnp.where(better, loss, best_loss)
                best_cam = jnp.where(better, opt_vars["cam"], best_cam)
                best_nm = jnp.where(better, n_mask, best_nm)
                first_loss = jnp.where((blk == 0) & (it_in == 0), loss,
                                       first_loss)
                return (opt_vars, st, best_loss, best_cam, best_nm,
                        first_loss, k2)

            return jax.lax.fori_loop(
                0, lengths_arr[blk], body,
                (opt_vars, st, best_loss, best_cam, best_nm, first_loss, k))

        (opt_vars, _, best_loss, best_cam, best_nm, first_loss,
         _) = jax.lax.fori_loop(0, n_blocks, outer, init)
    else:
        def body(it, carry):
            opt_vars, st, best_loss, best_cam, best_nm, first_loss, k = carry
            k, kiter = jax.random.split(k)
            if psum_axis is not None:
                kiter = jax.random.fold_in(kiter,
                                           jax.lax.axis_index(psum_axis))
            (loss, aux), g = grad_fn(opt_vars, params, map_pos, grid,
                                     feats, gt_color, gt_depth, kiter,
                                     opts, ropts, si, sj, r_query,
                                     eval_fn_builder)
            n_mask = aux[2]
            if psum_axis is not None:
                g = jax.lax.psum(g, psum_axis)
                loss = jax.lax.psum(loss, psum_axis)
                n_mask = jax.lax.psum(n_mask, psum_axis)
            opt_vars, st = adam.update(opt_vars, g, st, lr_tree)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_cam = jnp.where(better, opt_vars["cam"], best_cam)
            best_nm = jnp.where(better, n_mask, best_nm)
            first_loss = jnp.where(it == 0, loss, first_loss)
            return opt_vars, st, best_loss, best_cam, best_nm, first_loss, k

        (opt_vars, _, best_loss, best_cam, best_nm, first_loss,
         _) = jax.lax.fori_loop(0, opts.iters, body, init)
    ef_out = opt_vars.get("exp_feat")
    mlp_out = opt_vars.get("exp_mlp")

    out_cam = best_cam
    if health is None:
        health_out = jnp.zeros((3,))
    else:
        total_px = jnp.float32(opts.pixels)
        if psum_axis is not None:
            total_px = total_px * jax.lax.psum(1, psum_axis)
        out_cam, health_out = _apply_health_gate(
            health, best_loss, best_nm.astype(jnp.float32),
            cam7_init, best_cam, opts, total_px=total_px)
        # creep immunity (round-4 flagship replay, BASELINE.md): a gradual
        # tracking slide raises the loss ~1.7x per few frames — slowly
        # enough that an EMA updated on every accepted frame follows it up
        # and the reject threshold never fires (the r4 v2 run drifted
        # 36 cm at 0 rejects). The EMA therefore only updates on frames
        # within health_freeze x of itself (healthy frames sit < 1.35x on
        # the 2000-frame replay; the slide sits 1.7-4x), so sustained
        # elevation is measured against a pinned healthy level instead of
        # chasing it. The pose is still only rejected at health_gate x.
    # the 4x4 pose is produced in-program: converting on the host would
    # dispatch ~10 eager device ops (each a multi-ms round trip on remote
    # runtimes)
    from ..ops.camera import c2w_from_tensor, c2w_to_4x4

    best_c2w44 = c2w_to_4x4(c2w_from_tensor(out_cam))
    return out_cam, best_c2w44, first_loss, best_loss, ef_out, mlp_out, \
        health_out


track_frame = partial(jax.jit, static_argnames=(
    "opts", "ropts", "use_selected"))(_track_frame_impl)
