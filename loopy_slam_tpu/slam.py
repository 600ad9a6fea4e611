"""LoopySLAM orchestrator: one process, one device program, host control.

Replaces the reference's 3-process topology (tracker + mapper + point-cloud
RPC server with pipes/shared memory, reference src/Point_SLAM.py:37-252)
with a sequential host loop that is semantically equivalent to the
reference's pipe-synchronized schedule:

    map(0); track(1) .. track(k*E); map(k*E); track(k*E+1) ...

(the reference tracker blocks at every_frame boundaries until the mapper
finishes the previous mapping frame — Tracker.py:272-277, Mapper.py:835-842
— so the interleaving above reproduces exactly which map state each tracked
frame sees).

All hot loops (tracking pose optimization, mapping feature/decoder
optimization, point insertion, k-NN index rebuild) are jitted device
programs; the host only does frame IO, keyframe bookkeeping, and (rare)
loop-closure control flow.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULTS
from .mapping import mapper as mapper_mod
from .mapping import tracker as tracker_mod
from .mapping import place_recognition as pr
from .mapping.fragments import FragmentManager
from .mapping.loop_closure import LoopCloser, LoopClosureConfig
from .mapping.point_cloud import (MapOptions, MapState, init_map,
                                  input_cloud_insert, valid_mask)
from .ops import knn, tsdf
from .models.decoder import init_decoders, trainable_mask
from .models.renderer import RenderOptions, render_batch_ray
from .ops.camera import (c2w_from_tensor, c2w_to_4x4, get_rays,
                         np_c2w_from_tensor, tensor_from_c2w)
from .ops.image import dynamic_radius_maps, select_pixels_by_grad
from .utils.datasets import get_dataset
from .utils.io import save_checkpoint, write_ply_points


from functools import partial as _partial


@jax.jit
def _split17(key):
    """One device dispatch producing 16 fresh keys + the carried key.

    Eager jax.random.split costs ~200 ms per call on tunneled remote
    runtimes (each eager op is a multi-ms dispatch); the host loop instead
    draws from a pool refilled 16-at-a-time by this single program.
    """
    ks = jax.random.split(key, 17)
    return tuple(ks[i] for i in range(17))


@_partial(jax.jit, static_argnames=("use_rq",))
def _stack_window(kf_color, kf_depth, kf_rq, color, depth, rq_cur, idxs,
                  use_rq: bool):
    """Gather the mapping window's pixel stacks in ONE device program
    (the previous eager where/take chain was ~6 multi-ms dispatches)."""
    is_cur = (idxs < 0)[:, None, None]
    safe = jnp.maximum(idxs, 0)
    kc = jnp.where(is_cur[..., None], color[None],
                   jnp.take(kf_color, safe, axis=0))
    kd = jnp.where(is_cur, depth[None], jnp.take(kf_depth, safe, axis=0))
    krq = None
    if use_rq:
        krq = jnp.where(is_cur, rq_cur[None], jnp.take(kf_rq, safe, axis=0))
    return kc, kd, krq


@_partial(jax.jit, donate_argnames=("kf_color", "kf_depth"))
def _kf_insert(kf_color, kf_depth, color, depth, slot):
    return kf_color.at[slot].set(color), kf_depth.at[slot].set(depth)


@jax.jit
def _kf_insert_rq(kf_rq, rq, slot):
    return kf_rq.at[slot].set(rq)


_ADAM_INIT = None


def _adam_init_jit():
    """Jitted adam.init: the eager zeros_like tree costs ~100+ ms of
    per-leaf dispatches on remote runtimes; one program costs ~4 ms."""
    global _ADAM_INIT
    if _ADAM_INIT is None:
        from .ops import adam as adam_mod
        _ADAM_INIT = jax.jit(adam_mod.init)
    return _ADAM_INIT


@jax.jit
def _dequantize_frame(color_u8, depth_u16, depth_scale):
    """Expand a quantized frame upload to f32 on device."""
    color = color_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    depth = depth_u16.astype(jnp.float32) * depth_scale
    return color, depth


def _upload_frame(color_np, depth_np):
    """Host->device frame transfer, quantized to cut tunnel bandwidth.

    Color rides as uint8 (matches the 8-bit source images; <=1/510
    rounding, far below the photometric loss scale) and depth as uint16
    with a per-frame scale (<=max_depth/131070 absolute error — finer
    than the uint16 PNGs the datasets store). ~4 MB instead of 13 MB per
    680x1200 frame, ~100 ms saved per frame on the ~80 MB/s tunneled
    runtime."""
    c8 = np.clip(np.rint(color_np * 255.0), 0, 255).astype(np.uint8)
    dmax = float(depth_np.max())
    scale = max(dmax, 1e-6) / 65535.0
    d16 = np.rint(depth_np * (1.0 / scale)).astype(np.uint16)
    return _dequantize_frame(jnp.asarray(c8), jnp.asarray(d16),
                             jnp.float32(scale))


def _arg_specs(tree):
    """Replace arrays in a pytree of jit args with ShapeDtypeStructs so
    the tree can be kept (and later passed to .lower()) without holding
    device buffers alive or tripping on donated ones."""
    def spec(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                        if isinstance(x, np.ndarray)
                                        else x.dtype)
        return x
    return jax.tree.map(spec, tree)


def update_cam(cfg) -> Dict[str, float]:
    """Rescale/crop intrinsics (reference src/Point_SLAM.py:155-176)."""
    cam = dict(cfg["cam"])
    if cam.get("crop_size") is not None:
        ch, cw = cam["crop_size"]
        sx = cw / cam["W"]
        sy = ch / cam["H"]
        cam["fx"] *= sx
        cam["fy"] *= sy
        cam["cx"] *= sx
        cam["cy"] *= sy
        cam["W"], cam["H"] = cw, ch
    e = cam.get("crop_edge") or 0
    if e > 0:
        cam["H"] -= 2 * e
        cam["W"] -= 2 * e
        cam["cx"] -= e
        cam["cy"] -= e
    return cam


class LoopySLAM:
    def __init__(self, cfg: Dict, output: Optional[str] = None):
        self.cfg = cfg
        self.verbose = cfg["verbose"]
        self.output = output or cfg["data"]["output"]
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "ckpts"), exist_ok=True)

        # run lock: exactly one live session per output directory. A
        # second concurrent run against the same output silently doubles
        # device contention and interleaves checkpoint writes (the round-4
        # flagship slip ran two bit-identical processes on one chip,
        # BASELINE.md "process-management slip"). flock releases
        # automatically when the process exits, however it exits.
        import fcntl
        lock_path = os.path.join(self.output, ".run.lock")
        # 'a' not 'w': flock is advisory, so opening with 'w' would
        # truncate the LIVE holder's pid record before the lock attempt —
        # the contention diagnostic would always say 'pid unknown'
        self._run_lock = open(lock_path, "a")
        try:
            fcntl.flock(self._run_lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            holder = ""
            try:
                with open(lock_path) as f:
                    holder = f.read().strip()
            except OSError:
                pass
            raise RuntimeError(
                f"output directory {self.output} is already in use by a "
                f"live run (pid {holder or 'unknown'}). Pick a different "
                "--output or stop the other run first.")
        self._run_lock.truncate(0)
        self._run_lock.write(f"{os.getpid()}\n")
        self._run_lock.flush()
        if cfg["verbose"]:
            print(f"session pid={os.getpid()} devices="
                  f"{[str(d) for d in jax.devices()]}")

        from .models import decoder as decoder_mod

        decoder_mod.set_bf16_trunks(cfg["model"].get("bf16_trunks", True))

        cam = update_cam(cfg)
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy = cam["fx"], cam["fy"]
        self.cx, self.cy = cam["cx"], cam["cy"]

        self.topts = tracker_mod.TrackOptions.from_cfg(cfg)._replace(
            H=self.H, W=self.W, fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy)
        self.mopts_map = MapOptions.from_cfg(cfg)
        self.mopts = mapper_mod.MapperOptions.from_cfg(cfg)._replace(
            H=self.H, W=self.W, fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy)
        self.ropts_tracker = RenderOptions.from_cfg(
            cfg, sigmoid_coef=cfg["rendering"]["sigmoid_coef_tracker"])
        self.ropts_mapper = RenderOptions.from_cfg(
            cfg, sigmoid_coef=cfg["rendering"]["sigmoid_coef_mapper"])

        self.dataset = get_dataset(cfg)
        self.n_img = len(self.dataset)

        seed = cfg["setup_seed"]
        self.key = jax.random.PRNGKey(seed)
        self.nprng = np.random.default_rng(seed)
        self._key_pool: List = []
        self._dev_cache: Dict = {}  # host scalar/array -> device handle

        self.key, kinit = jax.random.split(self.key)
        self.params = init_decoders(kinit, cfg)
        self._load_pretrained_geo()
        self.dec_mask = trainable_mask(self.params, cfg)

        # start with a small buffer and double as the map fills: optimizer
        # and gradient traffic scale with allocated capacity, so
        # right-sizing keeps mapping iterations cheap early on (a handful of
        # one-time recompiles per growth step)
        self.initial_capacity = int(cfg["pointcloud"].get(
            "initial_capacity", 2 ** 15))
        self.map_state: MapState = init_map(
            self.mopts_map, capacity=min(self.initial_capacity,
                                         self.mopts_map.capacity))
        # host shadow of map_state.count, so capacity checks / prints never
        # force a device round trip
        self._count_host = 0

        self.estimate_c2w = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w = np.zeros((self.n_img, 4, 4), np.float32)

        m = cfg["mapping"]
        self.every_frame = m["every_frame"]
        self.keyframe_every = m["keyframe_every"]
        self.keyframe_global_every = m["keyframe_global_every"]
        self.mapping_window_size = m["mapping_window_size"] * (
            2 if self.n_img > 4000 else 1)
        self.use_dynamic_radius = cfg["use_dynamic_radius"]

        # keyframe stores: pixel data on device (ring buffers), poses on host
        kf_cap = self.n_img // min(self.keyframe_every,
                                   self.keyframe_global_every) + 4
        self.kf_color = jnp.zeros((kf_cap, self.H, self.W, 3), jnp.float32)
        self.kf_depth = jnp.zeros((kf_cap, self.H, self.W), jnp.float32)
        self.kf_rq = (jnp.zeros((kf_cap, self.H, self.W), jnp.float32)
                      if self.use_dynamic_radius else None)
        self.kf_slots_used = 0
        self.kf_slot_of_idx: Dict[int, int] = {}
        self.keyframe_list: List[int] = []     # frame idx, local (per segment)
        self.keyframe_global_list: List[int] = []
        self.kf_est_c2w: Dict[int, np.ndarray] = {}
        self.kf_gt_c2w: Dict[int, np.ndarray] = {}
        self.selected_keyframes: Dict[int, List] = {}

        self.prev_mapped_idx = None  # previous mapping frame index
        self.cur_r_add = None
        self.cur_r_query = None
        self.encode_exposure = cfg["model"]["encode_exposure"]
        self._prev_frame = None  # (color, depth) for the visual odometer
        # tracking health gate state [ema_mean_loss, n_rejected]; lives on
        # device for the whole run (mapping/tracker.py health docstring)
        # [loss EMA, total rejects, consecutive-reject streak]
        self.track_health = jnp.zeros((3,))
        self.exposure_feat = jnp.zeros((cfg["model"]["exposure_dim"],))
        self.kf_exposure: Dict[int, np.ndarray] = {}
        # per-mapped-frame exposure latents + on-disk color-decoder
        # snapshots so final_eval can re-render each frame under the
        # decoder/exposure state it was mapped with (reference
        # Mapper.py:798-802 exposure_feat_all + ckpts/color_decoder/*.pt,
        # consumed at Mapper.py:1095-1114)
        self.mapped_exposure: Dict[int, np.ndarray] = {}
        self.timings: Dict[str, List[float]] = {"track": [], "map": []}
        # arg shape-specs of the two hot programs, captured at their call
        # sites so roofline() can lower/compile the EXACT programs the run
        # executes and read XLA's flop/byte accounting (bench.py MFU)
        self._roofline_specs: Dict[str, Dict] = {}
        # host cache of the ACTIVE segment's frames (color uint8 + depth),
        # filled by the run loop and consumed by the loop-closure path —
        # _tsdf_registration_cloud and the per-frame ORB baseline would
        # otherwise re-load every segment frame from the dataset TWICE at
        # each segment boundary (the r4 bench's 117 s tail frame was
        # mostly this: ~50 dataset decodes on the critical path). Evicted
        # after the segment's TSDF cloud + ORB baseline are computed.
        self._seg_frames: Dict[int, tuple] = {}

        # submaps + loop closure
        self.fm = FragmentManager(
            m["segment_rel_trans"], m["segment_rot_cos"],
            self.H, self.W, self.fx, self.fy, self.cx, self.cy)
        self.lc = LoopCloser(LoopClosureConfig.from_cfg(cfg), self.fm)
        self.active_sensor_start = 0
        self.registration_voxel = cfg["meshing"].get(
            "registration_voxel", 5.0 / 512.0)
        seg_strategy = cfg["mapping"]["segment_strategy"]
        if seg_strategy not in ("rot_trans", "fixed", "none"):
            # a typo here would silently disable loop closure
            raise ValueError(
                f"mapping.segment_strategy={seg_strategy!r} is not one of "
                "'rot_trans' (motion-triggered submaps, the reference "
                "default), 'fixed' (every segment_fixed_n mapped frames), "
                "or 'none' (single global map, loop closure off)")
        self.lc_enabled = seg_strategy in ("rot_trans", "fixed")
        if self.lc_enabled and self.n_img > 20:
            # warm the segment-boundary TSDF programs off the critical
            # path: the first loop-closure frame otherwise pays the
            # integrate/extract compiles inside a mapped frame's wall time
            # (part of the r4 bench's 117 s tail; the 31-frame bench DOES
            # reach a segment boundary, so the gate must include it).
            # Skipped only for tiny test sessions (<= 20 frames), which
            # never close a segment.
            self._warm_lc_programs()

        # multi-chip: rays data-parallel over a device mesh (mapping is the
        # throughput bottleneck; tracking latency gains little from DP at
        # these batch sizes). Single device -> mesh is None -> plain path.
        n_dev = int(cfg.get("parallel", {}).get("n_devices", 0))
        self.mesh = None
        self._sharded_opt = {}
        map_shard = bool(cfg.get("parallel", {}).get("map_shard", False))
        if n_dev > 1 and not map_shard and len(jax.devices()) >= n_dev:
            from .parallel.sharded import make_mesh
            self.mesh = make_mesh(n_dev)
            if self.verbose:
                print(f"mapping data-parallel over {n_dev} devices")

        # map sharding: the point buffer itself cell-sharded across the
        # mesh with ring-collective k-NN (capacity scaling beyond one
        # chip's HBM; parallel/map_shard.py). self.map_state then becomes
        # a lazily-refreshed single-device SNAPSHOT for cold paths
        # (render/eval/segment-close/checkpoints) while the hot paths run
        # on self._smap.
        self.shard_mesh = None
        self._smap = None
        self._smap_dirty = False
        self._shard_progs: Dict = {}
        if map_shard:
            from .parallel import map_shard as msh
            n_sh = n_dev if n_dev > 1 else len(jax.devices())
            n_sh = 1 << (n_sh.bit_length() - 1)  # power of two
            if n_sh > 1:
                self.shard_mesh = msh.make_mesh(n_sh)
                cap_l = max(min(self.initial_capacity,
                                self.mopts_map.capacity) // n_sh, 2048)
                self._smap = msh.init_sharded_map(
                    self.shard_mesh, cap_l, self.mopts_map.c_dim,
                    self.mopts_map.cell_size, self.mopts_map.table_size,
                    self.mopts_map.max_per_cell)
                if self.verbose:
                    print(f"map cell-sharded over {n_sh} devices "
                          f"({cap_l} rows/shard)")

        from .utils.telemetry import WandbLogger
        self.wandb = WandbLogger(cfg, name=os.path.basename(self.output))

        # periodic render-vs-GT residual panels (reference Visualizer.vis,
        # src/utils/Visualizer.py:64-172). Gating parity: fire at the final
        # optimizer iteration of frames with idx % vis_freq == 0, idx > 0
        # (Tracker.py:385-390, Mapper.py:766). Our optimizer loops are fused
        # fori_loops, so the vis_inside variant renders only at loop exit.
        from .utils.visualizer import Visualizer
        self.tracking_vis = self.mapping_vis = None
        tv = int(cfg["tracking"].get("vis_freq", 0) or 0)
        if tv > 0:
            self.tracking_vis = Visualizer(
                tv, os.path.join(self.output, "tracking_vis"), self,
                verbose=self.verbose)
        mv = int(cfg["mapping"].get("vis_freq", 0) or 0)
        if mv > 0:
            self.mapping_vis = Visualizer(
                mv, os.path.join(self.output, "mapping_vis"), self,
                verbose=self.verbose)

    # ------------------------------------------------------------------
    def _next_key(self):
        """Draw from the pre-split key pool (one device dispatch per 16)."""
        if not self._key_pool:
            out = _split17(self.key)
            self.key = out[0]
            self._key_pool = list(out[1:])
        return self._key_pool.pop()

    def _dev(self, value, dtype=np.float32):
        """Cached device scalar/array upload: iteration schedules and LR
        tables repeat the same few values every frame — upload each once."""
        arr = np.asarray(value, dtype)
        k = (arr.tobytes(), arr.shape, str(dtype))
        if k not in self._dev_cache:
            self._dev_cache[k] = jnp.asarray(arr)
        return self._dev_cache[k]

    # ------------------------------------------------------------------
    def _load_pretrained_geo(self):
        path = self.cfg["pretrained_decoders"].get("middle_fine", "")
        if not path:
            return
        # resolve relative paths against the cwd, then the repo root, so
        # `pretrained/geo_decoder.pkl` in a config works from any cwd
        cand = [path, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            path)]
        found = next((p for p in cand if os.path.exists(p)), None)
        if found is None:
            # a configured-but-missing trunk must not silently fall back
            # to a frozen RANDOM trunk (fix_geo_decoder freezes whatever
            # is loaded; the degraded config costs ~2x ATE)
            raise FileNotFoundError(
                f"pretrained_decoders.middle_fine = {path!r} not found "
                f"(tried {cand}); clear the setting to train from "
                "random init")
        import pickle
        with open(found, "rb") as f:
            geo = pickle.load(f)
        for k, v in geo.items():
            if k in self.params["geo"]:
                self.params["geo"][k] = jax.tree.map(jnp.asarray, v)
        if self.verbose:
            print(f"Loaded pretrained geometry decoder from {found}")

    # ------------------------------------------------------------------
    def _dynamic_radius(self, color_np):
        if not self.use_dynamic_radius:
            return None, None
        pc = self.cfg["pointcloud"]
        r_add, r_query = dynamic_radius_maps(
            color_np, pc["radius_add_max"], pc["radius_add_min"],
            pc["radius_query_ratio"], pc["color_grad_threshold"])
        return jnp.asarray(r_add), jnp.asarray(r_query)

    # ------------------------------------------------------------------
    # Tracking
    # ------------------------------------------------------------------
    def track_frame(self, idx, color, depth, color_np,
                    depth_np=None) -> np.ndarray:
        """Optimize the pose of frame idx; returns 4x4 c2w estimate."""
        t = self.cfg["tracking"]
        pre = self.estimate_c2w[idx - 1]
        if t["const_speed_assumption"] and idx >= 2:
            delta = pre @ np.linalg.inv(self.estimate_c2w[idx - 2])
            init_c2w = delta @ pre
        elif t["visual_odometer"] and idx >= 2 and self._prev_frame is not None:
            # direct RGBD odometry as the motion model
            # (reference Tracker.py:304-309 via Open3D hybrid odometry)
            from .ops.odometry import rgbd_odometry

            pc, pd = self._prev_frame
            T = np.asarray(rgbd_odometry(
                pc, pd, color, depth,
                (self.fx, self.fy, self.cx, self.cy)))
            init_c2w = pre @ np.linalg.inv(T)
        else:
            init_c2w = pre
        cam7 = jnp.asarray(tensor_from_c2w(init_c2w))

        sel_i = sel_j = None
        use_selected = False
        if t["sample_with_color_grad"]:
            flat, _ = select_pixels_by_grad(
                self.topts.ignore_edge_H, self.H - self.topts.ignore_edge_H,
                self.topts.ignore_edge_W, self.W - self.topts.ignore_edge_W,
                t["pixels"], color_np,
                gt_depth=(depth_np if depth_np is not None
                          else np.asarray(depth)),
                depth_limit=t["depth_limit"], rng=self.nprng)
            if flat.size >= 16:
                # FIXED pool length: the survivor count of the gradient/
                # depth filters varies per frame, and a varying shape
                # would recompile the track program EVERY frame (measured
                # on the TUM run: 39 s/frame, all of it compiles). The
                # program samples opts.pixels uniformly from the pool
                # anyway, so resampling the pool to a constant length
                # with replacement preserves the sampling distribution.
                pool_n = 15 * t["pixels"]
                if flat.size != pool_n:
                    flat = self.nprng.choice(flat, pool_n, replace=True)
                sel_i = jnp.asarray(flat % self.W, jnp.int32)
                sel_j = jnp.asarray(flat // self.W, jnp.int32)
                use_selected = True

        kt = self._next_key()
        if self.shard_mesh is not None:
            has_rq = self.cur_r_query is not None
            step = self._shard_prog(
                ("track", use_selected, has_rq),
                lambda: self._msh().make_map_shard_track(
                    self.shard_mesh, self.topts, self.ropts_tracker,
                    use_selected=use_selected, has_rq=has_rq,
                    has_exposure=self.encode_exposure))
            args = [self.params, self._smap, color, depth, cam7, kt,
                    self.track_health]
            if use_selected:
                args += [sel_i, sel_j]
            if has_rq:
                args += [self.cur_r_query]
            if self.encode_exposure:
                args += [self.exposure_feat]
            (best_cam, best_c2w44, first_loss, best_loss, ef,
             exp_mlp, self.track_health) = step(*args)
        else:
            s = self.map_state
            targs = (self.params, s.pos, s.grid, s.feat, color, depth,
                     cam7, kt)
            tkw = dict(sel_i=sel_i, sel_j=sel_j, r_query=self.cur_r_query,
                       use_selected=use_selected,
                       exposure_feat=(self.exposure_feat
                                      if self.encode_exposure else None),
                       health=self.track_health)
            self._roofline_specs["track"] = {
                "args": _arg_specs(targs + (self.topts,
                                            self.ropts_tracker)),
                "kwargs": _arg_specs(tkw)}
            (best_cam, best_c2w44, first_loss, best_loss, ef,
             exp_mlp, self.track_health) = tracker_mod.track_frame(
                *targs, self.topts, self.ropts_tracker, **tkw)
        if self.encode_exposure and ef is not None:
            # tracker co-optimizes the exposure latent and MLP
            # (Tracker.py:329-344); both are shared with the mapper
            self.exposure_feat = ef
            self.params = {**self.params,
                           "col": {**self.params["col"], "exposure": exp_mlp}}
        # device->host fetches cost a full round trip (~30-40 ms on a
        # tunneled runtime); only pay for them when someone will read them
        if self.verbose:
            print(f"idx:{idx}, re-rendering loss: "
                  f"{float(first_loss):.2f}->{float(best_loss):.2f}")
            th = np.asarray(self.track_health)
            if th[1] > getattr(self, "_last_rejects", 0):
                self._last_rejects = th[1]
                print(f"idx:{idx}, tracking health gate: pose update "
                      f"REJECTED (total {int(th[1])}), kept motion-model "
                      f"pose; loss ema {th[0]:.3f}")
        if self.wandb.enabled:
            self.wandb.log({"idx_track": idx,
                            "tracking_loss": float(best_loss)})
        return np.asarray(best_c2w44)  # single fetch; 4x4 built in-program

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # Map-sharding facade (parallel.map_shard): hot paths mutate
    # self._smap; cold paths read self.map_state, refreshed here.
    # ------------------------------------------------------------------
    def _msh(self):
        from .parallel import map_shard as msh
        return msh

    def _shard_prog(self, key, builder):
        """Cache compiled sharded programs by a hashable key."""
        if key not in self._shard_progs:
            self._shard_progs[key] = builder()
        return self._shard_progs[key]

    def _sync_eval_state(self):
        """Refresh the single-device snapshot of the sharded map (pos /
        feat / count / grid of self.map_state) that render/eval/segment
        close/checkpoint code reads. No-op when in sync or not sharded."""
        if self.shard_mesh is None or not self._smap_dirty:
            return
        pos_np, feat_np, _ = self._msh().gather_host(self._smap)
        n = len(pos_np)
        cap = int(2 ** np.ceil(np.log2(max(n + 1024, 2048))))
        pos = jnp.zeros((cap, 3), jnp.float32).at[:n].set(
            jnp.asarray(pos_np))
        feat = jnp.zeros((cap, feat_np.shape[1] if n else
                          2 * self.mopts_map.c_dim),
                         jnp.float32).at[:n].set(jnp.asarray(feat_np))
        grid = knn.build(pos, jnp.arange(cap) < n, self.mopts_map.cell_size,
                         self.mopts_map.table_size,
                         self.mopts_map.max_per_cell)
        self.map_state = self.map_state._replace(
            pos=pos, feat=feat, count=jnp.asarray(n, jnp.int32), grid=grid)
        self._count_host = n
        self._smap_dirty = False

    def _scatter_to_shards(self, pos_np, feat_np, slack: int = 24000):
        """Replace the sharded map with host points (segment open, merge,
        restore). Per-shard capacity sized for hash imbalance + growth."""
        n_sh = self.shard_mesh.devices.size
        msh = self._msh()
        counts = np.bincount(
            msh.owner_of_points_np(pos_np, self.mopts_map.cell_size, n_sh),
            minlength=n_sh) if len(pos_np) else np.zeros(n_sh, int)
        need = int(counts.max()) + max(slack // n_sh, 2048)
        cap_l = int(2 ** np.ceil(np.log2(max(need, 2048))))
        self._smap = msh.scatter_from_host(
            self.shard_mesh, pos_np, feat_np, cap_l, self.mopts_map)

    def _insert_candidates_sharded(self, color, depth, cur_c2w_j, prev_j,
                                   key, n_rays, overlap=None,
                                   flat_idx=None):
        """Sharded surface-point insertion: prepare the candidate batch
        (replicated), gate globally with a ring pass, insert per-owner
        (parallel/map_shard.py), and append gated locations to the
        single-device input cloud. Returns the n_locations device scalar.
        flat_idx switches to the color-gradient pixel picks (radius_min
        gating)."""
        ks, ka = jax.random.split(key)
        if flat_idx is None:
            rays_o, rays_d, d, c, valid, dra = (
                mapper_mod.sample_insert_candidates_jit(
                    ks, color, depth, cur_c2w_j, prev_j, self.mopts,
                    n_rays, overlap, self.cur_r_add))
            r_default = self.mopts_map.radius_add
        else:
            rays_o, rays_d, d, c, valid, dra = (
                mapper_mod.pixel_insert_candidates_jit(
                    flat_idx, color, depth, cur_c2w_j, self.mopts,
                    self.cur_r_add))
            r_default = self.mopts_map.radius_min
        r_add = (dra if dra is not None
                 else jnp.full((rays_o.shape[0],), r_default, jnp.float32))
        ins = self._shard_prog(
            "insert", lambda: self._msh().make_shard_add_candidates(
                self.shard_mesh, self.mopts_map))
        self._smap, n_loc, gate = ins(self._smap, rays_o, rays_d, d, ka,
                                      valid, r_add)
        self._smap_dirty = True
        s = self.map_state
        in_pos, in_rgb, in_count = input_cloud_insert(
            s.in_pos, s.in_rgb, s.in_count, rays_o, rays_d, d, c, gate,
            self.mopts_map.input_capacity)
        self.map_state = s._replace(in_pos=in_pos, in_rgb=in_rgb,
                                    in_count=in_count)
        return n_loc

    def _maybe_grow_capacity(self, headroom: int = 6000):
        """Double the point buffers when the next insertion could overflow."""
        if self.shard_mesh is not None:
            n_sh = self.shard_mesh.devices.size
            cap_l = self._smap.pos.shape[1]
            # x2 slack over even split: spatial-hash ownership is balanced
            # but not exact
            maxcap_l = max(2 * self.mopts_map.capacity // n_sh, 2048)
            mx = int(np.asarray(self._smap.count).max())
            need = mx + max(headroom // n_sh * 2, 3000)
            if need <= cap_l or cap_l >= maxcap_l:
                return
            new_cap_l = cap_l
            while need > new_cap_l and new_cap_l < maxcap_l:
                new_cap_l *= 2
            new_cap_l = min(new_cap_l, maxcap_l)
            self._smap = self._msh().grow_sharded(
                self.shard_mesh, self._smap, new_cap_l, self.mopts_map)
            if self.verbose:
                print(f"grew sharded point buffer {cap_l} -> {new_cap_l} "
                      "rows/shard")
            return
        s = self.map_state
        cap = s.pos.shape[0]
        maxcap = self.mopts_map.capacity
        need = self._count_host + headroom
        if need <= cap or cap >= maxcap:
            return
        new_cap = cap
        while need > new_cap and new_cap < maxcap:
            new_cap *= 2
        new_cap = min(new_cap, maxcap)
        pos = jnp.zeros((new_cap, 3), jnp.float32).at[:cap].set(s.pos)
        feat = jnp.zeros((new_cap, s.feat.shape[1]),
                         jnp.float32).at[:cap].set(s.feat)
        # adaptive from the CONFIGURED sizes: escalation re-finds the
        # minimal table/row capacity with zero drops for the current
        # density (the plain knn.build here silently re-dropped points a
        # previous escalation had recovered; starting from the grown
        # sizes instead would pin a density spike's bloated row width —
        # and query cost scales with it — for the rest of the run)
        grid = knn.build_adaptive(pos, jnp.arange(new_cap) < s.count,
                                  self.mopts_map.cell_size,
                                  self.mopts_map.table_size,
                                  self.mopts_map.max_per_cell)
        self.map_state = s._replace(pos=pos, feat=feat, grid=grid)
        if self.verbose:
            print(f"grew point buffer {cap} -> {new_cap}")

    # ------------------------------------------------------------------
    # Submaps + loop closure
    # ------------------------------------------------------------------
    def _start_new_segment(self, idx, cur_c2w, gt_c2w, color_np, depth_np):
        """Close the active segment (archive to host, carry-over overlap
        points) and open a new one anchored at the current frame. Mirrors
        check_index/init_segment/update_fragments (neural_point.py:
        1283-1315,1220-1250,1138-1218)."""
        first = not self.fm.fragments
        des = pr.extract_orb(color_np)
        n_carry = 0
        if not first:
            self._sync_eval_state()  # map-sharded: refresh the snapshot
            s = self.map_state
            cnt = int(s.count)
            c_dim = self.mopts_map.c_dim
            npc = np.asarray(s.pos[:cnt])
            feat_host = np.asarray(s.feat[:cnt])
            geo = feat_host[:, :c_dim]
            col = feat_host[:, c_dim:]
            in_cnt = int(s.in_count)
            spts = np.asarray(s.in_pos[self.active_sensor_start:in_cnt])
            srgb = np.asarray(s.in_rgb[self.active_sensor_start:in_cnt])
            carry = (self.fm.carry_over_mask(cur_c2w, npc) if cnt
                     else np.zeros(0, bool))
            self.fm.close_active(npc, geo, col, spts, srgb, carry)
            # fresh active buffer seeded with the carried-over block
            n_carry = int(carry.sum())
            cap0 = max(self.initial_capacity,
                       int(2 ** np.ceil(np.log2(max(n_carry + 24000, 2)))))
            state = init_map(self.mopts_map,
                             capacity=min(cap0, self.mopts_map.capacity))
            if n_carry:
                state = state._replace(
                    pos=state.pos.at[:n_carry].set(jnp.asarray(npc[carry])),
                    feat=state.feat.at[:n_carry].set(
                        jnp.asarray(feat_host[carry])),
                    count=jnp.asarray(n_carry, jnp.int32))
            state = state._replace(
                grid=knn.build_adaptive(state.pos, valid_mask(state),
                                        self.mopts_map.cell_size,
                                        self.mopts_map.table_size,
                                        self.mopts_map.max_per_cell),
                in_pos=s.in_pos, in_rgb=s.in_rgb, in_count=s.in_count)
            self.map_state = state
            self._count_host = n_carry
            if self.shard_mesh is not None:
                # fresh sharded active buffer seeded with the carry-over
                self._scatter_to_shards(
                    npc[carry] if n_carry else np.zeros((0, 3), np.float32),
                    feat_host[carry] if n_carry else np.zeros(
                        (0, 2 * self.mopts_map.c_dim), np.float32))
                self._smap_dirty = False  # snapshot == shards (just built)
            self.keyframe_list = []  # local keyframes reset (Mapper.py:906)
            if self.verbose:
                print(f"new segment at frame {idx} "
                      f"(carried {n_carry} points)")
        self.active_sensor_start = int(self.map_state.in_count)
        self.fm.start_fragment(idx, cur_c2w, gt_c2w, color_np, depth_np,
                               des, idx_start_features=n_carry)
        self.lc.on_new_segment(des)

    def _warm_lc_programs(self):
        """Compile-warm the TSDF fuse program with the run's real shapes
        (frame HxW, fixed 192^3 grid) so the first segment boundary
        doesn't pay the compile inside a mapped frame. extract_mesh is
        deliberately NOT warmed: it has no device programs (host
        marching tets on a fetched grid), so 'warming' it would just
        fetch 85 MB of empty grid through the tunnel (~10 s) for
        nothing."""
        g = tsdf.grid_for_bounds(np.zeros(3), np.ones(3) * 3.0,
                                 self.registration_voxel,
                                 fixed_dims=(192, 192, 192))
        g = tsdf.integrate(g, jnp.zeros((self.H, self.W)),
                           jnp.zeros((self.H, self.W, 3)),
                           jnp.eye(4), float(self.fx), float(self.fy),
                           float(self.cx), float(self.cy),
                           trunc=0.04, depth_trunc=30.0)
        jax.block_until_ready(g.tsdf)

    def _segment_frame(self, i):
        """A segment frame (float color, depth) from the run-loop cache,
        falling back to a dataset load (restore path / evicted entries).
        Color round-trips uint8 — identical to what on-disk datasets
        provide, and extract_orb quantizes to uint8 anyway."""
        if i in self._seg_frames:
            c_u8, d = self._seg_frames[i]
            return c_u8.astype(np.float32) / 255.0, d
        _, c, d, _ = self.dataset[i]
        return c, d

    def _tsdf_registration_cloud(self, start_idx, end_idx):
        """Fuse a segment's frames into a TSDF and return mesh vertices +
        colors — the registration cloud (compute_tsdf parity,
        neural_point.py:959-1017). The reference's ScalableTSDFVolume is
        block-sparse; this grid is dense with FIXED dims (the voxel adapts
        to the segment bounds instead), so the jitted integrate compiles
        once for the whole run. The registration pipeline voxel-downsamples
        to 0.04 anyway, so any voxel <= ~0.02 is equivalent for it."""
        frames, poses = [], []
        for i in range(start_idx, end_idx):
            frames.append(self._segment_frame(i))
            poses.append(self.estimate_c2w[i])
        # bound-derived voxel floor
        lo = np.array([np.inf] * 3)
        hi = -lo
        for (c, d), p in zip(frames[::max(len(frames) // 4, 1)],
                             poses[::max(len(frames) // 4, 1)]):
            m = d > 0
            if m.any():
                t = p[:3, 3]
                r = float(d[m].max())
                lo = np.minimum(lo, t - r)
                hi = np.maximum(hi, t + r)
        if not np.isfinite(lo).all():
            lo, hi = np.array([-3.0] * 3), np.array([3.0] * 3)
        grid = tsdf.fuse_frames(frames, poses, self.fx, self.fy, self.cx,
                                self.cy, voxel=self.registration_voxel,
                                trunc=0.04, bounds=(lo, hi),
                                fixed_dims=(192, 192, 192))
        verts, _faces, cols = tsdf.extract_mesh(grid)
        return verts, cols

    def _apply_loop_closure(self, idx) -> Optional[np.ndarray]:
        """apply_transformation parity (neural_point.py:1109-1136): fuse the
        just-closed segment's TSDF cloud, compute its ORB baseline, run
        correction once >3 segments exist, and rigidly apply the solved
        per-segment transforms to clouds, trajectory, and the device map."""
        frags = self.fm.fragments
        old, new = frags[-2], frags[-1]
        old.reg_points, old.reg_colors = self._tsdf_registration_cloud(
            old.start_idx, new.start_idx)
        frame_des = []
        for i in range(old.start_idx + 1, new.start_idx):
            c, _ = self._segment_frame(i)
            frame_des.append(pr.extract_orb(c))
        self.lc.compute_baseline(old.anchor_des, frame_des)
        # the closed segment's cached frames served their purpose (TSDF
        # cloud + ORB baseline); only the new segment's frames stay
        for i in list(self._seg_frames):
            if i < new.start_idx:
                del self._seg_frames[i]
        if len(frags) <= 3:
            return None
        corrections = self.lc.compute_correction()
        if corrections is None:
            return None
        if self.verbose:
            print(f"loop closure at frame {idx}: correcting "
                  f"{len(frags)} segments")
        # trajectory snapshots around the PGO (neural_point.py:149-150,
        # 229-231; consumed by the mesh-video tool and diagnostics)
        seg_i = len(frags) - 1
        save_checkpoint(
            os.path.join(self.output, "ckpts", f"{seg_i:05d}_before_pgo.pkl"),
            {"estimate_c2w_list": self.estimate_c2w.copy()})
        for i, f in enumerate(frags):
            N = corrections[i]
            last = i == len(frags) - 1
            end_idx = frags[i + 1].start_idx if not last else f.start_idx + 1
            for name in ("npc", "sensor_pts", "reg_points"):
                a = getattr(f, name)
                if a is not None and len(a):
                    setattr(f, name, a @ N[:3, :3].T + N[:3, 3])
            rng_c2w = self.estimate_c2w[f.start_idx:end_idx]
            corrected = np.einsum("ij,njk->nik", N, rng_c2w)
            corrected[:, 3] = [0, 0, 0, 1.0]
            self.estimate_c2w[f.start_idx:end_idx] = corrected
            f.anchor_est = self.estimate_c2w[f.start_idx].copy()
        # device: rigidly move the active segment's points
        N = jnp.asarray(corrections[-1], jnp.float32)
        if self.shard_mesh is not None:
            tf = self._shard_prog(
                "transform", lambda: self._msh().make_shard_transform(
                    self.shard_mesh, self.mopts_map))
            self._smap = tf(self._smap, N)
            self._smap_dirty = True
        else:
            s = self.map_state
            pos = s.pos @ N[:3, :3].T + N[:3, 3]
            # adaptive: the rigid move re-bins points against the hash
            # lattice, and two cells re-binned into one row can overflow it
            # (room0_r3d: drops grew 56 -> 948 over 15 PGO corrections)
            grid = knn.build_adaptive(pos, valid_mask(s),
                                      self.mopts_map.cell_size,
                                      self.mopts_map.table_size,
                                      self.mopts_map.max_per_cell)
            self.map_state = s._replace(pos=pos, grid=grid)
        save_checkpoint(
            os.path.join(self.output, "ckpts", f"{seg_i:05d}_after_pgo.pkl"),
            {"estimate_c2w_list": self.estimate_c2w.copy()})
        return self.estimate_c2w[frags[-1].start_idx].copy()

    def _build_end_state(self):
        """Merge all segments (duplicate-averaged) into a fresh device
        buffer — train_index_global + end=True feats (neural_point.py:
        1382-1392,1435-1504)."""
        self._sync_eval_state()  # map-sharded: refresh the snapshot
        s = self.map_state
        cnt = int(s.count)
        c_dim = self.mopts_map.c_dim
        npc = np.asarray(s.pos[:cnt])
        feat_host = np.asarray(s.feat[:cnt])
        geo, col = feat_host[:, :c_dim], feat_host[:, c_dim:]
        if len(self.fm.fragments) > 1:
            npc, geo, col = self.fm.merged_global(npc, geo, col)
        n = len(npc)
        cap = int(2 ** np.ceil(np.log2(max(n + 1024, 2))))
        pos = jnp.zeros((cap, 3), jnp.float32).at[:n].set(jnp.asarray(npc))
        feat = jnp.zeros((cap, 2 * c_dim), jnp.float32).at[:n].set(
            jnp.asarray(np.concatenate([geo, col], axis=1)))
        count = jnp.asarray(n, jnp.int32)
        # adaptive capacity: duplicate-averaged fragment overlap raises
        # per-cell density past any single fragment's (room0_r3d: 28284 of
        # 136k merged points — 21% — overflowed at the fragment-map M and
        # became invisible to every k-NN consumer in color refine + eval).
        # build_adaptive escalates row depth AND table size until nothing
        # drops (the r4 flagship's 128k merge was collision-bound: 568
        # drops survived 3 row doublings at the 2^16 table); a drop here
        # is silent accuracy loss for the rest of the run, so any residue
        # is a hard error, never a warning.
        grid = knn.build_adaptive(pos, jnp.arange(cap) < count,
                                  self.mopts_map.cell_size,
                                  self.mopts_map.table_size,
                                  self.mopts_map.max_per_cell)
        merge_drops = int(grid.n_dropped)
        if merge_drops:
            raise RuntimeError(
                f"global-merge kNN rebuild dropped {merge_drops} of {n} "
                "points even after adaptive row/table escalation — the "
                "merged cloud is denser than the index can represent; "
                "raise pointcloud.cell_table_size or max_per_cell")
        self.map_state = MapState(pos=pos, feat=feat, count=count,
                                  grid=grid, in_pos=s.in_pos,
                                  in_rgb=s.in_rgb, in_count=s.in_count)
        self._count_host = n
        if self.shard_mesh is not None:
            # the merged map continues training sharded (color refinement)
            self._scatter_to_shards(npc,
                                    np.concatenate([geo, col], axis=1))
            self._smap_dirty = False
        if self.verbose:
            print(f"merged global map: {n} points")

    # ------------------------------------------------------------------
    # Mapping
    # ------------------------------------------------------------------
    def _add_keyframe(self, idx, color, depth, cur_c2w, gt_c2w):
        if idx in self.kf_slot_of_idx:
            return
        slot = self.kf_slots_used
        if slot >= self.kf_color.shape[0]:
            return
        self.kf_slots_used += 1
        self.kf_slot_of_idx[idx] = slot
        self.kf_color, self.kf_depth = _kf_insert(
            self.kf_color, self.kf_depth, color, depth,
            self._dev(slot, np.int32))
        if self.use_dynamic_radius:
            self.kf_rq = _kf_insert_rq(self.kf_rq, self.cur_r_query,
                                       self._dev(slot, np.int32))
        self.kf_est_c2w[idx] = cur_c2w.copy()
        self.kf_gt_c2w[idx] = gt_c2w.copy()
        if self.encode_exposure:
            self.kf_exposure[idx] = np.asarray(self.exposure_feat)

    def _window(self, sources: List[Optional[int]], color, depth, cur_c2w):
        """Stack the optimization window. `sources` entries are keyframe
        frame-indices, or None for the current frame.

        The list is padded to a FIXED length upstream so the mapping program
        compiles once: a growing window would recompile optimize_map for
        every distinct size, which dominates wall-time on remote-compile
        TPU runtimes. Padding repeats window entries cyclically, keeping the
        sampling distribution over frames approximately the reference's
        equal-share-per-frame (Mapper.py:419-420).
        """
        n_slots = self.kf_color.shape[0]
        idxs = self._dev([self.kf_slot_of_idx.get(i, n_slots - 1)
                          if i is not None else -1 for i in sources],
                         np.int32)
        use_rq = self.use_dynamic_radius
        kc, kd, krq = _stack_window(
            self.kf_color, self.kf_depth, self.kf_rq if use_rq else None,
            color, depth, self.cur_r_query if use_rq else None, idxs,
            use_rq)
        poses = [cur_c2w if i is None else self.kf_est_c2w[i]
                 for i in sources]
        kp = jnp.asarray(np.stack(poses).astype(np.float32))
        return kc, kd, kp, krq

    def map_frame(self, idx, color, depth, gt_c2w, color_np,
                  depth_np=None, color_refine=False):
        cfg = self.cfg
        m = cfg["mapping"]
        init = idx == 0
        cur_c2w = self.estimate_c2w[idx]
        if depth_np is None:  # avoid a device fetch when the caller has it
            depth_np = np.asarray(depth)

        # ---------------- submap boundary ----------------
        new_fragment = False
        if self.lc_enabled and not color_refine:
            if self.cfg["mapping"]["segment_strategy"] == "fixed":
                # fixed-size segments (check_new_fragment 'fixed',
                # Mapper.py:338-341)
                size = self.cfg["mapping"]["fixed_segment_size"]
                new_fragment = (not self.fm.fragments) or (
                    idx % size == 0
                    and idx != self.fm.fragments[-1].start_idx)
            else:
                new_fragment = self.fm.should_start_new(cur_c2w)
            if new_fragment:
                self._start_new_segment(idx, cur_c2w, gt_c2w, color_np,
                                        depth_np)

        # ---------------- point insertion ----------------
        # n_loc counters stay on device until ONE combined fetch at the end
        # of this block: every device->host fetch costs a full round trip
        # (~30-40 ms on a tunneled runtime)
        frame_pts_add = 0
        n_add_dev = None
        if not color_refine:
            self._maybe_grow_capacity()
            if init:
                med = float(np.median(depth_np[depth_np > 0])) if (
                    depth_np > 0).any() else 2.5
                add_n = int(np.clip(m["pixels_adding"] * (med / 2.5) ** 2,
                                    m["pixels_adding"], m["pixels_adding"] * 3))
            else:
                add_n = m["pixels_adding"]
            cur_c2w_j = jnp.asarray(cur_c2w)
            # read the previous mapped pose FRESH from the trajectory so a
            # loop-closure correction applied since then is reflected
            # (reference reads estimate_c2w_list, Mapper.py:834,1007)
            prev_j = jnp.asarray(self.estimate_c2w[self.prev_mapped_idx]
                                 if self.prev_mapped_idx is not None
                                 else cur_c2w)
            k1, k2, k3 = self._next_key(), self._next_key(), self._next_key()
            if self.shard_mesh is not None:
                ins = self._insert_candidates_sharded
                if m["filter_before_add_points"] and not init:
                    n1 = ins(color, depth, cur_c2w_j, prev_j, k1, add_n,
                             overlap=False)
                    n2 = ins(color, depth, cur_c2w_j, prev_j, k2, 1000,
                             overlap=True)
                    n_add_dev = n1 + n2
                else:
                    n_add_dev = ins(color, depth, cur_c2w_j, prev_j, k1,
                                    add_n, overlap=None)
            elif m["filter_before_add_points"] and not init:
                self.map_state, n1 = mapper_mod.add_points_from_frame(
                    self.map_state, color, depth, cur_c2w_j, prev_j, k1,
                    self.mopts_map, self.mopts, add_n, overlap=False,
                    dynamic_r_add=self.cur_r_add)
                self.map_state, n2 = mapper_mod.add_points_from_frame(
                    self.map_state, color, depth, cur_c2w_j, prev_j, k2,
                    self.mopts_map, self.mopts, 1000, overlap=True,
                    dynamic_r_add=self.cur_r_add)
                n_add_dev = n1 + n2
            else:
                self.map_state, n1 = mapper_mod.add_points_from_frame(
                    self.map_state, color, depth, cur_c2w_j, prev_j, k1,
                    self.mopts_map, self.mopts, add_n, overlap=None,
                    dynamic_r_add=self.cur_r_add)
                n_add_dev = n1
            npx_grad = m["pixels_based_on_color_grad"]
            if npx_grad > 0:
                flat, _ = select_pixels_by_grad(0, self.H, 0, self.W,
                                                npx_grad, color_np,
                                                rng=self.nprng)
                if flat.size:
                    pick = self.nprng.choice(flat.size,
                                             size=min(npx_grad, flat.size),
                                             replace=False)
                    if pick.size < npx_grad:  # pad: keep the jit shape fixed
                        pick = np.concatenate(
                            [pick, pick[:npx_grad - pick.size]])
                    flat_j = jnp.asarray(flat[pick], jnp.int32)
                    if self.shard_mesh is not None:
                        n3 = self._insert_candidates_sharded(
                            color, depth, cur_c2w_j, None, k3, 0,
                            overlap=None, flat_idx=flat_j)
                    else:
                        self.map_state, n3 = mapper_mod.add_points_at_pixels(
                            self.map_state, color, depth, cur_c2w_j,
                            flat_j, k3, self.mopts_map, self.mopts,
                            dynamic_r_add=self.cur_r_add)
                    n_add_dev = n_add_dev + n3
            frame_pts_add = int(n_add_dev)  # the one host fetch
            self._count_host += frame_pts_add * self.mopts_map.N_add
            if self.verbose:
                print(f"{frame_pts_add} locations to add points "
                      f"(total {self._count_host}).")

        # ---------------- loop closure ----------------
        if new_fragment and len(self.fm.fragments) >= 2:
            corrected = self._apply_loop_closure(idx)
            if corrected is not None:
                self.estimate_c2w[idx] = corrected
                cur_c2w = corrected

        # ---------------- frustum feature selection ----------------
        if self.shard_mesh is not None and not color_refine:
            if m["frustum_feature_selection"]:
                fmask = self._shard_prog(
                    "frustum", lambda: self._msh().make_shard_frustum_mask(
                        self.shard_mesh, self.mopts))
                feat_mask = fmask(self._smap.pos, self._smap.count,
                                  jnp.asarray(cur_c2w), depth)
            else:
                cap_l = self._smap.pos.shape[1]
                feat_mask = (jnp.arange(cap_l)[None, :]
                             < self._smap.count[:, None])
        elif m["frustum_feature_selection"] and not color_refine:
            feat_mask = mapper_mod.frustum_feature_mask(
                self.map_state.pos, self.map_state.count, jnp.asarray(cur_c2w),
                depth, self.mopts)
        else:
            feat_mask = valid_mask(self.map_state)

        # ---------------- keyframe window ----------------
        refine_window_host = None
        if color_refine:
            # 'segments' keyframe selection: every fragment anchor + the
            # current frame (Mapper.py:386-395,402); merged end-state map
            self._build_end_state()
            if self.shard_mesh is not None:
                cap_l = self._smap.pos.shape[1]
                feat_mask = (jnp.arange(cap_l)[None, :]
                             < self._smap.count[:, None])
            else:
                feat_mask = valid_mask(self.map_state)  # shape may have grown
            if self.fm.fragments:
                refine_window_host = (
                    np.stack([f.gt_color for f in self.fm.fragments]),
                    np.stack([f.gt_depth for f in self.fm.fragments]),
                    np.stack([f.anchor_est for f in self.fm.fragments]),
                )
            window = list(self.keyframe_global_list) + [None]
            pix_per_frame = max(m["pixels"] // 10, 1)
        else:
            k = self.mapping_window_size - 2
            window = []
            if len(self.keyframe_list) > 1:
                cand = self.keyframe_list[:-1]
                method = self.cfg["mapping"]["keyframe_selection_method"]
                if method == "global":
                    # most recent k keyframes (Mapper.py:377-381)
                    window = cand[max(0, len(cand) - k):]
                else:  # 'overlap'
                    sel = mapper_mod.keyframe_selection_overlap(
                        self.nprng, depth_np, cur_c2w,
                        [self.kf_est_c2w[i] for i in cand], k, self.mopts)
                    window = [cand[s] for s in sel]
            if self.keyframe_list:
                window = window + [self.keyframe_list[-1]]
            self.selected_keyframes[idx] = [
                {"idx": i, "est_c2w": self.kf_est_c2w[i],
                 "gt_c2w": self.kf_gt_c2w[i]} for i in window]
            # pad to a fixed window so optimize_map compiles once; the
            # current frame must stay LAST (its exposure latent is the
            # trainable one)
            base: List[Optional[int]] = list(window) + [None]
            n_pad = max(self.mapping_window_size - len(base), 0)
            pads = [base[i % len(base)] for i in range(n_pad)]
            window = list(window) + pads + [None]
            pix_per_frame = max(m["pixels"] // len(window), 1)
        if refine_window_host is not None:
            hc, hd, hp = refine_window_host
            kc = jnp.concatenate([jnp.asarray(hc), color[None]], axis=0)
            kd = jnp.concatenate([jnp.asarray(hd), depth[None]], axis=0)
            kp = jnp.asarray(np.concatenate(
                [hp, cur_c2w[None]], axis=0).astype(np.float32))
            krq = None
            if self.use_dynamic_radius:
                krq = jnp.broadcast_to(self.cur_r_query[None],
                                       (kc.shape[0],) + self.cur_r_query.shape)
        else:
            kc, kd, kp, krq = self._window(window, color, depth, cur_c2w)

        # ---------------- iteration schedule ----------------
        num = m["iters_first"] if init else m["iters"]
        if color_refine:
            num = m["iters"] * 2  # x10 over 5 outer rounds (Mapper.py:885-895)
        if not init and not color_refine:
            num = int(np.clip(num * frame_pts_add / 300,
                              int(m["min_iter_ratio"] * num), 2 * num))
        geo_limit = m["geo_iter_first"] if init else int(
            num * m["geo_iter_ratio"])
        n_geo = min(geo_limit + 1, num)
        n_col = num - n_geo
        table = m["init"] if init else m["stage"]
        lrs_geo = self._dev([table["geometry"]["decoders_lr"],
                             table["geometry"]["geometry_lr"],
                             table["geometry"]["color_lr"]])
        lrs_col = self._dev([table["color"]["decoders_lr"],
                             table["color"]["geometry_lr"],
                             table["color"]["color_lr"]])

        dec_mask = self.dec_mask
        if color_refine:
            refine_cfg = dict(self.cfg)
            # fix the color decoder during refinement (Mapper.py:892)
            refine_cfg = {**self.cfg,
                          "mapping": {**m, "fix_color_decoder": True}}
            dec_mask = trainable_mask(self.params, refine_cfg)

        # bundle adjustment (Mapper.py:543-560,955-958): enabled once the
        # window has enough keyframes; poses become trainable 7-vectors,
        # the OLDEST keyframe and padded duplicate rows stay fixed
        ba_active = (m["BA"] and not color_refine
                     and len(self.keyframe_list) > 4)
        ba_row_mask = ba_lr = ba_window = iter_offset = None
        if ba_active:
            cams = np.stack([tensor_from_c2w(
                cur_c2w if i is None else self.kf_est_c2w[i])
                for i in window]).astype(np.float32)
            kf_rows = [i for i in window if i is not None]
            oldest = min(kf_rows) if kf_rows else None
            seen = set()
            mask_rows = []
            for i in window:
                first = i not in seen
                seen.add(i)
                mask_rows.append(1.0 if (first and i != oldest) else 0.0)
            ba_row_mask = jnp.asarray(mask_rows, jnp.float32)
            ba_lr = jnp.asarray(m["BA_cam_lr"], jnp.float32)

        use_mshard = self.shard_mesh is not None
        trainable = {"dec": self.params,
                     "feat": (self._smap.feat if use_mshard
                              else self.map_state.feat)}
        if ba_active:
            trainable["cams"] = jnp.asarray(cams)
            ba_window = jnp.asarray(
                [num * (m["geo_iter_ratio"] + 0.2),
                 num * (m["geo_iter_ratio"] + 0.3)], jnp.float32)
        kf_exposure = None
        if self.encode_exposure:
            dim = self.exposure_feat.shape[0]
            zeros = np.zeros(dim, np.float32)
            if refine_window_host is not None:
                src = [f.start_idx for f in self.fm.fragments]
            else:
                src = window[:-1]  # last = current (trainable latent)
            cur = np.asarray(self.exposure_feat)
            feats = [(cur if i is None
                      else np.asarray(self.kf_exposure.get(i, zeros)))
                     for i in src] + [cur]
            kf_exposure = jnp.asarray(np.stack(feats))
            trainable["exp"] = self.exposure_feat
        from .ops import adam as adam_mod

        # chunk the optimization so a single device program stays bounded
        # (long single executions can trip runtime watchdogs); Adam state
        # threads across chunks, so the result is identical to one program
        chunk = int(self.cfg["mapping"].get("device_chunk_iters", 64))
        outer = 5 if color_refine else 1
        adam_init_jit = _adam_init_jit()
        use_mesh = self.mesh is not None
        sharded_opt = None
        if use_mesh:
            from .parallel.sharded import make_sharded_optimize_map, replicate
            skey = (pix_per_frame, self.use_dynamic_radius)
            if skey not in self._sharded_opt:
                self._sharded_opt[skey] = make_sharded_optimize_map(
                    self.mesh, self.mopts, self.ropts_mapper, pix_per_frame,
                    self.use_dynamic_radius)
            sharded_opt = self._sharded_opt[skey]
        mshard_opt = None
        if use_mshard:
            mshard_opt = self._shard_prog(
                ("optimize", pix_per_frame, self.encode_exposure,
                 ba_active),
                lambda: self._msh().make_map_shard_optimize(
                    self.shard_mesh, self.mopts, self.ropts_mapper,
                    pix_per_frame, self.use_dynamic_radius,
                    with_exposure=self.encode_exposure,
                    with_ba=ba_active))
        for _ in range(outer):
            st = adam_init_jit(trainable)
            done_geo, done_col = 0, 0
            while done_geo + done_col < n_geo + n_col:
                g = min(chunk, n_geo - done_geo)
                c = min(chunk - g, n_col - done_col)
                km = self._next_key()
                if use_mshard:
                    args = (trainable, st, dec_mask, feat_mask,
                            self._smap.pos, self._smap.count,
                            self._smap.grid,
                            kc, kd, kp, krq, km, self._dev(g, np.int32),
                            self._dev(c, np.int32), lrs_geo, lrs_col,
                            kf_exposure)
                    if ba_active:
                        args = args + (ba_row_mask, ba_lr, ba_window,
                                       self._dev(done_geo + done_col,
                                                 np.int32))
                    trainable, st, aux = mshard_opt(*args)
                elif use_mesh:
                    args = replicate(self.mesh, (
                        trainable, st, dec_mask, feat_mask,
                        self.map_state.pos, self.map_state.grid, kc, kd, kp,
                        krq, km, self._dev(g, np.int32),
                        self._dev(c, np.int32), lrs_geo, lrs_col,
                        kf_exposure, ba_row_mask, ba_lr, ba_window,
                        self._dev(done_geo + done_col, np.int32)))
                    trainable, st, aux = sharded_opt(*args)
                else:
                    margs = (trainable, st, dec_mask, feat_mask,
                             self.map_state.pos, self.map_state.grid, kc,
                             kd, kp, krq, km, self._dev(g, np.int32),
                             self._dev(c, np.int32), lrs_geo, lrs_col,
                             self.mopts, self.ropts_mapper, pix_per_frame,
                             self.use_dynamic_radius, kf_exposure)
                    mkw = dict(
                        ba_row_mask=ba_row_mask, ba_lr=ba_lr,
                        ba_window=ba_window,
                        iter_offset=self._dev(done_geo + done_col,
                                              np.int32))
                    if g + c == chunk and not init and not color_refine:
                        # a full steady-state chunk (the hot program)
                        self._roofline_specs["map"] = {
                            "args": _arg_specs(margs),
                            "kwargs": _arg_specs(mkw),
                            "chunk_iters": chunk}
                    trainable, st, aux = mapper_mod.optimize_map(
                        *margs, **mkw)
                done_geo += g
                done_col += c
        if self.encode_exposure:
            self.exposure_feat = trainable["exp"]
            if not color_refine:
                # stamp the exposure latent + color-decoder state this frame
                # was mapped with (reference Mapper.py:798-802); final_eval
                # re-renders under these (Mapper.py:1095-1114)
                self.mapped_exposure[idx] = np.asarray(self.exposure_feat)
                cd_dir = os.path.join(self.output, "ckpts", "color_decoder")
                os.makedirs(cd_dir, exist_ok=True)
                save_checkpoint(
                    os.path.join(cd_dir, f"{idx:05d}.pkl"),
                    jax.tree.map(np.asarray, trainable["dec"]["col"]))
        if ba_active:
            # write optimized poses back (Mapper.py:782-797): keyframes'
            # est_c2w (first-occurrence rows only) and the current pose
            new_cams = np.asarray(trainable["cams"])
            seen = set()
            for row, i in enumerate(window):
                if i in seen or mask_rows[row] == 0.0:
                    continue
                seen.add(i)
                c2w4 = np_c2w_from_tensor(new_cams[row])
                if i is None:
                    cur_c2w = c2w4
                    self.estimate_c2w[idx] = c2w4
                else:
                    self.kf_est_c2w[i] = c2w4
        self.params = trainable["dec"]
        if use_mshard:
            self._smap = self._smap._replace(feat=trainable["feat"])
            self._smap_dirty = True
        else:
            self.map_state = self.map_state._replace(feat=trainable["feat"])
        if self.verbose or self.wandb.enabled:
            # one combined fetch of the loss aux (vs separate scalar
            # fetches); n_dropped rides along — it counts points the
            # spatial hash could NOT index (overflowed cell rows), the
            # silent-neighbor-loss failure mode of the kNN index, and
            # must be visible when it ever becomes nonzero
            dropped = (jnp.sum(self._smap.grid.n_dropped) if use_mshard
                       else self.map_state.grid.n_dropped).astype(
                jnp.float32)
            g, c, n, drop = np.asarray(
                jnp.stack(list(aux) + [dropped])).tolist()
            if self.verbose:
                print(f"idx: {idx}, geo_loss_pixel: {g / max(n, 1):.6f}, "
                      f"color_loss_pixel: {c / max(n, 1):.4f}, iters: {num}"
                      + (f", knn_dropped: {int(drop)}" if drop else ""))
            self.wandb.log({"idx_map": idx,
                            "geo_loss_pixel": g / max(n, 1),
                            "color_loss_pixel": c / max(n, 1),
                            "pts_total": self._count_host,
                            "knn_dropped": int(drop),
                            "num_joint_iters": num})

        # ---------------- keyframe bookkeeping (Mapper.py:982-1004) -------
        ok_gt = np.isfinite(gt_c2w).all()
        if ((idx % self.keyframe_every == 0 or idx == self.n_img - 2)
                and idx not in self.keyframe_list and ok_gt):
            self._add_keyframe(idx, color, depth, cur_c2w, gt_c2w)
            self.keyframe_list.append(idx)
        if ((idx % self.keyframe_global_every == 0 or idx == self.n_img - 2)
                and idx not in self.keyframe_global_list and ok_gt):
            self._add_keyframe(idx, color, depth, cur_c2w, gt_c2w)
            self.keyframe_global_list.append(idx)
        self.prev_mapped_idx = idx

    # ------------------------------------------------------------------
    # Full-image rendering (for eval/visualization)
    # ------------------------------------------------------------------
    def render_img(self, c2w, gt_depth, chunk=4096, r_query_map=None,
                   exposure_feat=None, col_params=None):
        """Full-frame render. exposure_feat/col_params re-render under a
        per-frame exposure latent and color-decoder snapshot (reference
        Mapper.py:1095-1114)."""
        self._sync_eval_state()  # map-sharded: render from the snapshot
        rays_o, rays_d = get_rays(self.H, self.W, self.fx, self.fy,
                                  self.cx, self.cy, jnp.asarray(c2w))
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        gd = jnp.asarray(gt_depth).reshape(-1)
        rq = (r_query_map.reshape(-1) if r_query_map is not None else None)
        n = rays_o.shape[0]
        depths, colors = [], []
        s = self.map_state
        params = self.params
        if col_params is not None:
            params = {**params, "col": jax.tree.map(jnp.asarray, col_params)}
        ef = (jnp.asarray(exposure_feat)
              if exposure_feat is not None else None)
        for i in range(0, n, chunk):
            sl = slice(i, min(i + chunk, n))
            ro, rd, d = rays_o[sl], rays_d[sl], gd[sl]
            pad = chunk - ro.shape[0]
            if pad:
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
                d = jnp.pad(d, (0, pad))
            rqc = None
            if rq is not None:
                rqc = jnp.pad(rq[sl], (0, pad), constant_values=1e-3)
            kr = self._next_key()
            dep, var, col, vmask = _render_chunk(
                params, s.pos, s.grid, s.feat, ro, rd, d, kr,
                self.ropts_mapper, rqc, ef)
            take = sl.stop - sl.start
            depths.append(np.asarray(dep)[:take])
            colors.append(np.asarray(col)[:take])
        depth = np.concatenate(depths).reshape(self.H, self.W)
        color = np.concatenate(colors).reshape(self.H, self.W, 3)
        return depth, color

    # ------------------------------------------------------------------
    def restore(self, ckpt_path: str) -> int:
        """Restore a live session from a checkpoint written by finalize().

        Returns the frame index to resume from (ckpt idx + 1). The
        reference cannot do this — its checkpoints feed only the offline
        eval tools (SURVEY.md §5, 'no restart-from-checkpoint of a live
        SLAM run exists'). Keyframe pixel data re-loads from the dataset;
        everything else (map buffers, decoders, trajectories, submap
        archive, exposure state) comes from the checkpoint.
        """
        from .utils.io import load_checkpoint

        ckpt = load_checkpoint(ckpt_path)
        last_idx = int(ckpt["idx"])
        self.params = jax.tree.map(jnp.asarray, ckpt["params"])

        # ---- map buffers: allocate the growth-policy capacity that covers
        # the saved prefix, then rebuild the spatial index. No clamp at
        # mopts_map.capacity: an end-of-run checkpoint written after the
        # global merge (_build_end_state) can legitimately hold more points
        # than the configured per-segment capacity.
        m = ckpt["map"]
        count = int(m["count"])
        cap = min(self.initial_capacity, self.mopts_map.capacity)
        while cap < count + 6000:
            cap *= 2
        pos = jnp.zeros((cap, 3), jnp.float32).at[:count].set(
            jnp.asarray(m["pos"]))
        feat = (jnp.zeros((cap, 2 * self.mopts_map.c_dim), jnp.float32)
                .at[:count, :self.mopts_map.c_dim].set(jnp.asarray(m["geo"]))
                .at[:count, self.mopts_map.c_dim:].set(jnp.asarray(m["col"])))
        grid = knn.build_adaptive(pos, jnp.arange(cap) < count,
                                  self.mopts_map.cell_size,
                                  self.mopts_map.table_size,
                                  self.mopts_map.max_per_cell)
        r = ckpt["resume"]
        in_cap = self.map_state.in_pos.shape[0]
        if int(r["in_count"]) > in_cap:
            raise ValueError(
                f"checkpoint holds {int(r['in_count'])} input-cloud points "
                f"but this session's input capacity is {in_cap} — resuming "
                "would silently drop sensor points from the exported cloud; "
                "rerun with the original pointcloud capacity settings")
        n_in = min(int(r["in_count"]), in_cap)
        self.map_state = self.map_state._replace(
            pos=pos, feat=feat, grid=grid,
            count=jnp.asarray(count, jnp.int32),
            in_pos=self.map_state.in_pos.at[:n_in].set(
                jnp.asarray(r["in_pos"][:n_in])),
            in_rgb=self.map_state.in_rgb.at[:n_in].set(
                jnp.asarray(r["in_rgb"][:n_in])),
            in_count=jnp.asarray(n_in, jnp.int32))
        self._count_host = count
        if self.shard_mesh is not None:
            feat_np = np.concatenate([np.asarray(m["geo"]),
                                      np.asarray(m["col"])], axis=1)
            self._scatter_to_shards(np.asarray(m["pos"])[:count],
                                    feat_np[:count].astype(np.float32))
            self._smap_dirty = False

        # ---- trajectories + keyframe metadata
        n = min(last_idx + 1, self.n_img)
        self.estimate_c2w[:n] = np.asarray(ckpt["estimate_c2w_list"])[:n]
        self.gt_c2w[:n] = np.asarray(ckpt["gt_c2w_list"])[:n]
        self.keyframe_global_list = list(ckpt["keyframe_list"])
        self.keyframe_list = list(r["keyframe_local_list"])
        self.kf_est_c2w = dict(ckpt["keyframe_est_c2w"])
        self.kf_gt_c2w = dict(r["kf_gt_c2w"])
        self.selected_keyframes = dict(ckpt["selected_keyframes"])
        self.exposure_feat = jnp.asarray(r["exposure_feat"])
        if "track_health" in r:  # absent in pre-gate checkpoints
            th = np.asarray(r["track_health"], np.float32)
            if th.shape[0] == 2:  # pre-streak checkpoints: streak = 0
                th = np.concatenate([th, np.zeros((1,), np.float32)])
            self.track_health = jnp.asarray(th)
        self.prev_mapped_idx = r["prev_mapped_idx"]

        # ---- keyframe pixel ring: re-read frames from the dataset in the
        # original slot order (slot ids must match kf_slot_of_idx); fail
        # loudly on inconsistent checkpoints — a silently dropped entry
        # would shift every later slot id against the restored state
        kf_order = list(r["kf_order"])
        missing = [i for i in kf_order if i not in self.kf_est_c2w]
        if missing:
            raise ValueError(
                f"checkpoint keyframes {missing} have no saved pose")
        if len(kf_order) > self.kf_color.shape[0]:
            raise ValueError(
                f"checkpoint holds {len(kf_order)} keyframes but this "
                f"session's ring fits {self.kf_color.shape[0]} — rerun "
                "with the original keyframe_every/--stop settings")
        for kf_idx in kf_order:
            _, color_np, depth_np, _ = self.dataset[kf_idx]
            color, depth = _upload_frame(color_np, depth_np)
            self.cur_r_add, self.cur_r_query = self._dynamic_radius(color_np)
            self._add_keyframe(kf_idx, color, depth,
                               self.kf_est_c2w[kf_idx],
                               self.kf_gt_c2w.get(
                                   kf_idx, self.kf_est_c2w[kf_idx]))
        # _add_keyframe stamped the CURRENT exposure latent; the saved
        # per-keyframe latents are authoritative
        self.kf_exposure = dict(r["kf_exposure"])
        self.mapped_exposure = dict(r.get("mapped_exposure", {}))

        # ---- submap archive + loop-closure bookkeeping: replay the
        # place-recognition database in fragment order so query result ids
        # keep indexing fragments correctly, and restore the per-segment
        # score baselines
        self.fm.fragments = list(r["fragments"])
        self.active_sensor_start = int(r["active_sensor_start"])
        for f in self.fm.fragments:
            self.lc.on_new_segment(f.anchor_des)
        if "dbow_scores" in r:
            self.lc.dbow_scores = list(r["dbow_scores"])
        elif self.fm.fragments:
            print("WARNING: checkpoint predates dbow_scores — the "
                  "loop-closure score-floor filter is disabled for "
                  "restored segments")

        # ---- RNG: continue the saved stream instead of replaying the one
        # frames 0..last_idx already consumed
        if "rng_key" in r:
            self.key = jnp.asarray(r["rng_key"])
            # restoring the unconsumed pool keeps stop-then-resume key
            # consumption identical to an uninterrupted run
            self._key_pool = [jnp.asarray(k) for k in r.get("rng_pool", [])]
        if "np_rng_state" in r:
            self.nprng.bit_generator.state = r["np_rng_state"]

        # ---- visual-odometry motion model needs the previous frame
        if self.cfg["tracking"]["visual_odometer"] and last_idx >= 0:
            _, c_prev, d_prev, _ = self.dataset[last_idx]
            self._prev_frame = _upload_frame(c_prev, d_prev)

        if self.verbose:
            print(f"resumed from {ckpt_path}: frame {last_idx}, "
                  f"{count} points, {len(self.fm.fragments)} segments, "
                  f"{self.kf_slots_used} keyframes")
        return last_idx + 1

    def run(self, stop: Optional[int] = None, start_idx: int = 0):
        stop = stop or self.cfg.get("stop") or 0
        if start_idx >= self.n_img:
            # resuming a checkpoint of an already-completed run
            if self.verbose:
                print(f"nothing to do: checkpoint covers all "
                      f"{self.n_img} frames")
            self.wandb.finish()
            return {
                "estimate_c2w": self.estimate_c2w[:self.n_img],
                "gt_c2w": self.gt_c2w[:self.n_img],
                "n_points": int(self.map_state.count),
            }
        progress = os.environ.get("LOOPY_PROGRESS")
        # Background frame prefetch: PNG/EXR decode costs ~0.2 s/frame at
        # full resolution (~400 s over a 2000-frame run), all of it host
        # CPU work that overlaps cleanly with device compute (PIL/numpy
        # release the GIL; so do device waits). A bounded lookahead keeps
        # at most 2 decoded frames in flight. The reference's separate
        # dataloader process serves the same purpose (SURVEY §2.1 #13).
        import queue as _queue
        import threading as _threading
        frames_q: _queue.Queue = _queue.Queue(maxsize=2)
        stop_evt = _threading.Event()

        def _producer():
            for i in range(start_idx, self.n_img):
                try:
                    item = self.dataset[i]
                except BaseException as e:  # noqa: BLE001
                    # a corrupt/missing frame must fail the run at the
                    # consumer, not silently kill this daemon thread and
                    # deadlock frames_q.get()
                    item = e
                while not stop_evt.is_set():
                    try:
                        frames_q.put((i, item), timeout=0.5)
                        break
                    except _queue.Full:
                        continue
                if stop_evt.is_set() or isinstance(item, BaseException):
                    return

        prefetch_t = _threading.Thread(target=_producer, daemon=True)
        prefetch_t.start()

        def _next_frame(idx):
            while True:
                try:
                    pf_idx, item = frames_q.get(timeout=10.0)
                    break
                except _queue.Empty:
                    if not prefetch_t.is_alive():
                        raise RuntimeError(
                            "frame prefetch thread died without delivering "
                            f"frame {idx}") from None
            if isinstance(item, BaseException):
                raise RuntimeError(
                    f"frame {pf_idx} failed to load") from item
            assert pf_idx == idx, (pf_idx, idx)  # strictly sequential
            return item

        # the producer must be stopped even when tracking/mapping
        # raises — otherwise it keeps decoding frames until the
        # queue fills and leaks a busy thread past run() (for
        # embedded/test callers that outlive the failed run)
        try:
            for idx in range(start_idx, self.n_img):
                if progress:
                    import sys
                    err = (np.linalg.norm(self.estimate_c2w[idx - 1][:3, 3]
                                          - self.gt_c2w[idx - 1][:3, 3])
                           if idx > 0 else 0.0)
                    print(f"[frame {idx}/{self.n_img} "
                          f"t={time.perf_counter():.0f} prev_err={err:.4f} "
                          f"pts={int(self.map_state.count)} "
                          f"segs={len(self.fm.fragments)}]",
                          file=sys.stderr, flush=True)
                t_f = time.perf_counter()
                _, color_np, depth_np, gt_c2w = _next_frame(idx)
                self.timings.setdefault("data", []).append(
                    time.perf_counter() - t_f)
                t_f = time.perf_counter()
                color, depth = _upload_frame(color_np, depth_np)
                if self.lc_enabled:
                    self._seg_frames[idx] = (
                        np.clip(color_np * 255.0, 0,
                                255).astype(np.uint8), depth_np)
                    # bounded even when no segment boundary ever fires
                    # (gentle trajectory): evict the OLDEST entries past
                    # the cap — _segment_frame falls back to a dataset
                    # load for evicted frames, so only speed is lost.
                    # 600 frames ~= 3.4 GB at 680x1200.
                    while len(self._seg_frames) > 600:
                        del self._seg_frames[min(self._seg_frames)]
                self.gt_c2w[idx] = gt_c2w
                self.cur_r_add, self.cur_r_query = self._dynamic_radius(color_np)
                self.timings.setdefault("upload", []).append(
                    time.perf_counter() - t_f)

                if idx <= 1 or self.cfg["tracking"]["gt_camera"]:
                    self.estimate_c2w[idx] = gt_c2w
                else:
                    t0 = time.perf_counter()
                    self.estimate_c2w[idx] = self.track_frame(
                        idx, color, depth, color_np, depth_np=depth_np)
                    self.timings["track"].append(time.perf_counter() - t0)
                    if self.tracking_vis is not None:
                        t_f = time.perf_counter()
                        self.tracking_vis.vis(
                            idx, self.topts.iters - 1, depth_np, color_np,
                            self.estimate_c2w[idx],
                            r_query_map=self.cur_r_query)
                        self.timings.setdefault("vis", []).append(
                            time.perf_counter() - t_f)

                if idx % self.every_frame == 0 or idx == self.n_img - 1:
                    if self.verbose:
                        print(f"Mapping Frame {idx}")
                    t0 = time.perf_counter()
                    self.map_frame(idx, color, depth, gt_c2w, color_np,
                                   depth_np=depth_np)
                    # hard sync: async runtimes may return before the optimizer
                    # chunks complete, which would misattribute mapping time to
                    # the next tracking call
                    _ = np.asarray((self._smap if self.shard_mesh is not None
                                    else self.map_state).feat[0, 0])
                    self.timings["map"].append(time.perf_counter() - t0)
                    if self.mapping_vis is not None:
                        t_f = time.perf_counter()
                        self.mapping_vis.vis(
                            idx, self.cfg["mapping"]["iters"] - 1,
                            depth_np, color_np,
                            self.estimate_c2w[idx],
                            r_query_map=self.cur_r_query)
                        self.timings.setdefault("vis", []).append(
                            time.perf_counter() - t_f)
                    if (idx == self.n_img - 1 and self.cfg["mapping"]["color_refine"]
                            and not stop):
                        if self.verbose:
                            print("color_refine")
                        self.map_frame(idx, color, depth, gt_c2w, color_np,
                                       depth_np=depth_np, color_refine=True)

                if self.cfg["tracking"]["visual_odometer"]:
                    self._prev_frame = (color, depth)

                # periodic checkpointing (Logger cadence, Mapper.py:1027-1033)
                ckpt_freq = self.cfg["mapping"]["ckpt_freq"]
                if (self.cfg["mapping"]["save_ckpts"] and idx > 0
                        and idx % ckpt_freq == 0):
                    self.finalize(idx, final=False)

                if stop and idx != 0 and idx % stop == 0:
                    break

        finally:
            stop_evt.set()
        self.finalize(idx)
        if self.verbose:
            # per-phase timing report (reference prints registration/PGO
            # stats at exit, Mapper.py:1051-1055)
            reg, pgo = self.lc.registration_times, self.lc.pgo_times
            print(f"number of pgos: {len(pgo)}, average time per pgo: "
                  f"{np.mean(pgo) if pgo else float('nan'):.3f}s")
            print(f"number of registration rounds: {len(reg)}, average: "
                  f"{np.mean(reg) if reg else float('nan'):.3f}s")
            tr, mp = self.timings['track'], self.timings['map']
            if tr:
                print(f"tracking: n={len(tr)} median "
                      f"{np.median(tr)*1e3:.0f} ms")
            th = np.asarray(self.track_health)
            if th[1] > 0 or self.topts.health_gate > 0:
                print(f"tracking health gate: {int(th[1])} pose updates "
                      f"rejected (loss ema {th[0]:.3f})")
            if mp:
                print(f"mapping:  n={len(mp)} median "
                      f"{np.median(mp)*1e3:.0f} ms")
            for name in ("data", "upload", "vis"):
                v = self.timings.get(name, [])
                if v:
                    print(f"{name}: n={len(v)} median "
                          f"{np.median(v)*1e3:.0f} ms "
                          f"total {np.sum(v):.0f} s")
        self._sync_eval_state()
        return {
            "estimate_c2w": self.estimate_c2w[:idx + 1],
            "gt_c2w": self.gt_c2w[:idx + 1],
            "n_points": int(self.map_state.count),
        }

    # ------------------------------------------------------------------
    def final_eval(self, every: Optional[int] = None, save_renders=True,
                   gt_mesh=None, n_2d_views=100):
        """End-of-run evaluation (reference Mapper.py:1056-1218 + tools):
        re-render every Nth frame at the estimated poses -> PSNR / MS-SSIM /
        depth-L1; TSDF-fuse the renders into a mesh; if a ground-truth mesh
        is available (synthetic scenes provide one analytically) compute
        accuracy/completion/ratio/F-score and virtual-view depth-L1."""
        from .tools.eval_images import evaluate_renders
        from .tools.get_mesh_tsdf_fusion import mesh_from_renders
        from .utils.io import write_ply_mesh

        every = every or self.every_frame
        rdir = os.path.join(self.output, "rendered_every_frame")
        os.makedirs(rdir, exist_ok=True)
        pairs, renders, poses = [], [], []
        n_reused = 0
        for idx in range(0, self.n_img, every):
            _, gc, gd, _ = self.dataset[idx]
            # resume-aware: a prior (interrupted) final_eval over the same
            # final checkpoint already wrote this frame's renders — reuse
            # them instead of re-rendering (the map state is deterministic
            # from the checkpoint, so the saved arrays are identical)
            cpath = os.path.join(rdir, f"color_{idx:05d}.npy")
            dpath = os.path.join(rdir, f"depth_{idx:05d}.npy")
            if save_renders and os.path.exists(cpath) \
                    and os.path.exists(dpath):
                color, depth = np.load(cpath), np.load(dpath)
                pairs.append((color, gc, depth, gd))
                renders.append((color.astype(np.float32),
                                depth.astype(np.float32)))
                poses.append(self.estimate_c2w[idx])
                n_reused += 1
                continue
            rq = None
            if self.use_dynamic_radius:
                _, rq = self._dynamic_radius(gc)
            ef = col_params = None
            if self.encode_exposure:
                # re-render under the exposure latent + color-decoder
                # snapshot this frame was mapped with (reference
                # Mapper.py:1095-1114; falls back to the final decoder
                # when no snapshot exists, matching its except path)
                ef = self.mapped_exposure.get(idx,
                                              np.asarray(self.exposure_feat))
                cd_path = os.path.join(self.output, "ckpts",
                                       "color_decoder", f"{idx:05d}.pkl")
                if os.path.exists(cd_path):
                    from .utils.io import load_checkpoint
                    col_params = load_checkpoint(cd_path)
            depth, color = self.render_img(self.estimate_c2w[idx], gd,
                                           r_query_map=rq,
                                           exposure_feat=ef,
                                           col_params=col_params)
            pairs.append((color, gc, depth, gd))
            renders.append((color.astype(np.float32),
                            depth.astype(np.float32)))
            poses.append(self.estimate_c2w[idx])
            if save_renders:
                np.save(os.path.join(rdir, f"color_{idx:05d}.npy"), color)
                np.save(os.path.join(rdir, f"depth_{idx:05d}.npy"), depth)
        if self.verbose and n_reused:
            print(f"final_eval: reused {n_reused} saved renders from {rdir}")
        render_stats = evaluate_renders(
            pairs, lpips_weights=self.cfg["rendering"].get("lpips_weights"))
        if self.verbose:
            print("render metrics:", render_stats)

        recon_stats = {}
        if self.cfg["meshing"]["eval_rec"]:
            cam = {"fx": self.fx, "fy": self.fy, "cx": self.cx,
                   "cy": self.cy, "H": self.H, "W": self.W}
            voxel = self.cfg["meshing"].get("mesh_voxel", 0.02)
            verts, faces, colors = mesh_from_renders(
                renders, poses, cam, voxel=voxel)
            os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)
            write_ply_mesh(os.path.join(self.output, "mesh",
                                        "final_mesh.ply"),
                           verts, faces, colors)
            if gt_mesh is None and hasattr(self.dataset, "gt_mesh"):
                gt_mesh = self.dataset.gt_mesh()
            if gt_mesh is not None and len(faces):
                from .tools.cull_mesh import cull_mesh
                from .tools.eval_recon import calc_2d_metric, calc_3d_metric

                # evaluate against the gt surface actually observed by the
                # trajectory (the reference evaluates culled gt meshes,
                # src/tools/cull_mesh.py)
                gv, gf, _, unseen = cull_mesh(
                    gt_mesh[0], gt_mesh[1],
                    [self.gt_c2w[i] for i in range(0, self.n_img, every)],
                    {"H": self.H, "W": self.W,
                     "fx": self.fx, "fy": self.fy,
                     "cx": self.cx, "cy": self.cy},
                    return_unseen=True)
                gt_mesh = (gv, gf)
                recon_stats = calc_3d_metric((verts, faces), gt_mesh)
                recon_stats.update(calc_2d_metric(
                    (verts, faces), gt_mesh, n_views=n_2d_views,
                    pc_unseen=unseen))
                if self.verbose:
                    print("reconstruction metrics:", recon_stats)
        return {**render_stats, **recon_stats}

    # ------------------------------------------------------------------
    def roofline(self) -> Dict[str, Dict[str, float]]:
        """XLA cost accounting of the two hot programs (the exact
        track/map programs this session last executed, re-lowered from
        their captured arg shapes). Returns {phase: {flops, bytes}} —
        flops is the compiler's per-execution FLOP count, bytes its
        HBM-traffic estimate. bench.py divides by measured wall times for
        achieved FLOP/s + bandwidth vs the chip's peaks (MFU)."""
        out = {}
        fns = {"track": tracker_mod.track_frame,
               "map": mapper_mod.optimize_map}
        for name, spec in self._roofline_specs.items():
            ca = fns[name].lower(
                *spec["args"], **spec["kwargs"]).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca is None:
                continue
            out[name] = {"flops": float(ca.get("flops", 0.0)),
                         "bytes": float(ca.get("bytes accessed", 0.0))}
            if "chunk_iters" in spec:
                out[name]["chunk_iters"] = spec["chunk_iters"]
        return out

    # ------------------------------------------------------------------
    def finalize(self, last_idx, final: bool = True):
        self._sync_eval_state()  # map-sharded: checkpoint the snapshot
        s = self.map_state
        n_in = int(s.in_count)
        pts = np.asarray(s.in_pos)[:n_in]
        rgb = np.asarray(s.in_rgb)[:n_in]
        if final:
            # only the end-of-run call exports the named-final artifacts
            np.save(os.path.join(self.output, "final_point_cloud"),
                    np.hstack([pts, rgb * 255.0]))
            write_ply_points(
                os.path.join(self.output, "final_point_cloud.ply"),
                pts, rgb)
        ckpt = {
            "estimate_c2w_list": self.estimate_c2w,
            "gt_c2w_list": self.gt_c2w,
            "idx": last_idx,
            "params": jax.tree.map(np.asarray, self.params),
            "map": {
                "pos": np.asarray(s.pos)[:int(s.count)],
                "geo": np.asarray(s.feat)[:int(s.count),
                                          :self.mopts_map.c_dim],
                "col": np.asarray(s.feat)[:int(s.count),
                                          self.mopts_map.c_dim:],
                "count": int(s.count),
            },
            "keyframe_list": self.keyframe_global_list,
            "keyframe_est_c2w": self.kf_est_c2w,
            "selected_keyframes": self.selected_keyframes,
            "cfg": self.cfg,
            # live-resume state (a capability the reference lacks — its
            # ckpts feed only the offline tools, SURVEY.md §5): everything
            # needed to reconstruct the in-memory session. Keyframe PIXELS
            # are not stored — they re-load from the dataset by index.
            "resume": {
                "in_pos": pts, "in_rgb": rgb, "in_count": n_in,
                "keyframe_local_list": self.keyframe_list,
                "kf_gt_c2w": self.kf_gt_c2w,
                "kf_order": sorted(self.kf_slot_of_idx,
                                   key=self.kf_slot_of_idx.get),
                "kf_exposure": self.kf_exposure,
                "mapped_exposure": self.mapped_exposure,
                "exposure_feat": np.asarray(self.exposure_feat),
                "track_health": np.asarray(self.track_health),
                "prev_mapped_idx": self.prev_mapped_idx,
                "fragments": self.fm.fragments,
                "active_sensor_start": self.active_sensor_start,
                "dbow_scores": list(self.lc.dbow_scores),
                "rng_key": np.asarray(self.key),
                "rng_pool": [np.asarray(k) for k in self._key_pool],
                "np_rng_state": self.nprng.bit_generator.state,
            },
        }
        save_checkpoint(os.path.join(self.output, "ckpts",
                                     f"{last_idx:05d}.pkl"), ckpt)
        if final:
            self.wandb.finish()


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("ropts",))
def _render_chunk(params, pos, grid, feat, ro, rd, d, key, ropts, rq,
                  exposure_feat=None):
    valid = d > 0
    return render_batch_ray(params, pos, grid, feat, ro, rd, d, valid,
                            key, ropts, "color", r_query=rq,
                            exposure_feat=exposure_feat)
