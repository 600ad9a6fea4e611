"""Probe a single submap registration pair from cached fused clouds.

Fuses (once, cached to npz) the segments of a run snapshot, then reports
for a chosen (s, t) pair: fitness/rmse at identity, at T_gt, and after
each ICP stage — to localize WHERE registration leaves the true basin.

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_reg_pair.py \
      --run output/Replica/room0_r3c --seg 7 \
      --starts 0 110 230 365 480 580 695 850 --pairs 3,0 4,0 5,0
"""

import argparse
import os
import pickle
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loopy_slam_tpu.config import load_config
from loopy_slam_tpu.ops import registration as reg
from loopy_slam_tpu.utils.datasets import get_dataset
from scripts.diagnose_lc import fuse_segment


def fitness_at(sp, tree, T, max_corr=0.03):
    moved = sp @ T[:3, :3].T + T[:3, 3]
    d, _ = tree.query(moved, k=1, distance_upper_bound=max_corr)
    ok = np.isfinite(d)
    return float(ok.mean()), float(np.sqrt((d[ok] ** 2).mean())) if ok.any() else np.inf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--config", default="configs/Replica/room0.yaml")
    ap.add_argument("--seg", type=int, required=True)
    ap.add_argument("--starts", type=int, nargs="+", required=True)
    ap.add_argument("--pairs", nargs="+", required=True, help="s,t pairs")
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--voxel", type=float, default=0.01)
    args = ap.parse_args()

    cfg = load_config(args.config)
    ds = get_dataset(cfg)
    fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
    est = np.asarray(pickle.load(open(
        f"{args.run}/ckpts/{args.seg:05d}_before_pgo.pkl", "rb"))
        ["estimate_c2w_list"], np.float64)
    gt = np.stack([np.asarray(ds[i][3]) for i in range(len(est))]) \
        if not hasattr(ds, "poses") else np.asarray(ds.poses)

    cache = f"{args.run}/ckpts/regclouds_{args.seg:05d}.npz"
    starts = args.starts
    if os.path.exists(cache):
        z = np.load(cache)
        clouds = [z[f"p{i}"] for i in range(len(starts) - 1)]
    else:
        clouds = []
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            print(f"fusing segment {i} [{s},{e}) ...", flush=True)
            rp, _rc = fuse_segment(ds, est, s, e, fx, fy, cx, cy,
                                   args.voxel, args.stride)
            clouds.append(rp)
        np.savez_compressed(cache, **{f"p{i}": c for i, c in
                                      enumerate(clouds)})

    rng = np.random.default_rng(0)
    for pair in args.pairs:
        s, t = map(int, pair.split(","))
        sp, tp = clouds[s], clouds[t]
        ks, kt = est[starts[s]], est[starts[t]]
        gs, gtt = gt[starts[s]], gt[starts[t]]
        # true transform mapping source cloud -> target cloud in world:
        # p_s ~= (est_s gt_s^-1) p_true ; p_t ~= (est_t gt_t^-1) p_true
        T_gt = (kt @ np.linalg.inv(gtt)) @ (gs @ np.linalg.inv(ks))
        print(f"\n=== pair {s}->{t}: n_s={len(sp)} n_t={len(tp)} "
              f"|t_gt|={np.linalg.norm(T_gt[:3, 3]):.4f}")
        sub = rng.choice(len(sp), min(40000, len(sp)), replace=False)
        sp_i = sp[sub]
        tree = cKDTree(tp)
        for name, T in (("identity", np.eye(4)), ("T_gt", T_gt)):
            for mc in (0.03, 0.01):
                f, r = fitness_at(sp_i, tree, T, mc)
                print(f"  fitness@{name} corr={mc}: {f:.4f} rmse={r:.4f}")
        tn = reg.estimate_normals(tp, radius=0.1, max_nn=50,
                                  camera_location=kt[:3, 3])
        T = np.eye(4)
        for mc, tk in ((0.3, 0.1), (0.1, 0.03), (0.03, 0.01)):
            T, fit, rmse = reg.icp_point_to_plane(sp_i, tp, tn, mc, T,
                                                  max_iter=30, tukey_k=tk)
            dt = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
            print(f"  after stage corr={mc} tukey={tk}: fit={fit:.4f} "
                  f"rmse={rmse:.4f} |t|={np.linalg.norm(T[:3, 3]):.4f} "
                  f"|t-t_gt|={dt:.4f}")


if __name__ == "__main__":
    main()
