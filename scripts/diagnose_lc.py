"""Offline repro of a loop-closure round from run snapshots.

Reconstructs the fragment state at a given segment-close event from the
`*_before_pgo.pkl` trajectory snapshot + the dataset, re-runs
LoopCloser.compute_correction with per-edge GT diagnostics, and compares
the solved per-segment corrections against both the GT-optimal corrections
and the ones the live run actually applied (from `*_after_pgo.pkl`).

Usage:
  JAX_PLATFORMS=cpu python scripts/diagnose_lc.py \
      --run output/Replica/room0_r3c --seg 7 \
      --starts 0 110 230 365 480 580 695 850 [--stride 3]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loopy_slam_tpu.config import load_config
from loopy_slam_tpu.mapping.fragments import FragmentManager
from loopy_slam_tpu.mapping.loop_closure import LoopCloser, LoopClosureConfig
from loopy_slam_tpu.mapping import place_recognition as pr
from loopy_slam_tpu.ops import tsdf
from loopy_slam_tpu.utils.datasets import get_dataset


def fuse_segment(ds, est, s, e, fx, fy, cx, cy, voxel, stride):
    frames, poses = [], []
    for i in range(s, e, stride):
        _, c, d, _ = ds[i]
        frames.append((c, d))
        poses.append(est[i])
    lo = np.array([np.inf] * 3)
    hi = -lo
    for (c, d), p in zip(frames, poses):
        m = d > 0
        if m.any():
            t = p[:3, 3]
            r = float(d[m].max())
            lo = np.minimum(lo, t - r)
            hi = np.maximum(hi, t + r)
    grid = tsdf.fuse_frames(frames, poses, fx, fy, cx, cy, voxel=voxel,
                            trunc=0.04, bounds=(lo, hi),
                            fixed_dims=(192, 192, 192))
    verts, _f, cols = tsdf.extract_mesh(grid)
    return verts, cols


def umeyama(src, dst):
    mu_s, mu_d = src.mean(0), dst.mean(0)
    S = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(S)
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ D @ Vt
    return R, mu_d - R @ mu_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--config", default="configs/Replica/room0.yaml")
    ap.add_argument("--seg", type=int, required=True)
    ap.add_argument("--starts", type=int, nargs="+", required=True,
                    help="segment start frames INCLUDING the newest")
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--voxel", type=float, default=0.01)
    args = ap.parse_args()

    cfg = load_config(args.config)
    ds = get_dataset(cfg)
    H, W = ds.H, ds.W
    fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
    est = np.asarray(pickle.load(open(
        f"{args.run}/ckpts/{args.seg:05d}_before_pgo.pkl", "rb"))
        ["estimate_c2w_list"], np.float64)
    applied = np.asarray(pickle.load(open(
        f"{args.run}/ckpts/{args.seg:05d}_after_pgo.pkl", "rb"))
        ["estimate_c2w_list"], np.float64)
    gt = np.stack([np.asarray(ds[i][3]) for i in range(len(est))]) \
        if not hasattr(ds, "poses") else np.asarray(ds.poses)

    starts = args.starts
    fm = FragmentManager(1e9, -1e9, H, W, fx, fy, cx, cy)
    lcc = LoopClosureConfig.from_cfg(cfg)
    lc = LoopCloser(lcc, fm)
    print(f"LC config: filter={lcc.filter} kval={lcc.kval} "
          f"mult_dbow={lcc.mult_dbow} orb_filter={lcc.orb_filter}")

    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else s + 1
        _, c0, d0, _ = ds[s]
        des = pr.extract_orb(np.asarray(c0))
        fm.start_fragment(s, est[s], gt[s], np.asarray(c0), np.asarray(d0),
                          des)
        lc.on_new_segment(des)
        if i + 1 < len(starts):
            cache = (f"{args.run}/ckpts/regcloud_{args.seg:05d}_{i:02d}.npz")
            if os.path.exists(cache):
                z = np.load(cache)
                rp, rc = z["p"], z["c"]
            else:
                print(f"fusing segment {i} [{s},{e}) ...", flush=True)
                rp, rc = fuse_segment(ds, est, s, e, fx, fy, cx, cy,
                                      args.voxel, args.stride)
                np.savez_compressed(cache, p=rp, c=rc)
            f = fm.fragments[-1]
            f.reg_points, f.reg_colors = rp, rc
            frame_des = [pr.extract_orb(np.asarray(ds[j][1]))
                         for j in range(s + 1, e, args.stride)]
            lc.compute_baseline(des, frame_des)

    corrections = lc.compute_correction()
    if corrections is None:
        print("compute_correction returned None (no valid loop edges)")
        return
    print("\nper-segment corrections: solved(offline) vs applied(live) "
          "vs gt-optimal |t| (m):")
    for i in range(len(starts) - 1):
        s, e = starts[i], starts[i + 1]
        Ra, ta = umeyama(est[s:e, :3, 3], applied[s:e, :3, 3])
        Rg, tg = umeyama(est[s:e, :3, 3], gt[s:e, :3, 3])
        ts = corrections[i][:3, 3]
        print(f"  seg{i}: solved {np.linalg.norm(ts):.4f}  "
              f"applied {np.linalg.norm(ta):.4f}  "
              f"gt-opt {np.linalg.norm(tg):.4f}")


if __name__ == "__main__":
    main()
