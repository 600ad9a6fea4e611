"""ATE RMSE evaluation (aligned via Horn, and un-aligned).

Equivalent of reference src/tools/eval_ate.py:45-302: aligns the estimated
trajectory to ground truth with the closed-form Horn method, reports
translational RMSE; poses with non-finite ground truth are masked out
(convert_poses, eval_ate.py:249-266). Consumes either in-memory trajectory
arrays or a checkpoint written by LoopySLAM.finalize.

CLI:  python -m loopy_slam_tpu.tools.eval_ate <cfg.yaml> [--output DIR]
      [--no_align] [--plot]
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict

import numpy as np

from ..ops.camera import horn_align


def convert_poses(c2w_list: np.ndarray, scale=1.0):
    """Mask non-finite poses; returns (poses(N,4,4), mask)."""
    poses = []
    mask = []
    for c2w in c2w_list:
        ok = np.isfinite(c2w).all()
        mask.append(ok)
        p = c2w.copy() if ok else np.eye(4, dtype=c2w.dtype)
        p[:3, 3] *= scale
        poses.append(p)
    return np.stack(poses), np.array(mask, bool)


def evaluate_trajectories(est: np.ndarray, gt: np.ndarray,
                          align: bool = True) -> Dict[str, float]:
    """ATE on (N,4,4) trajectories. Returns rmse (aligned) and rmse_no_align,
    plus mean/median stats, in the trajectory's length units."""
    _, mask = convert_poses(gt)
    est_t = est[mask][:, :3, 3].T
    gt_t = gt[mask][:, :3, 3].T
    rot, trans, err_aligned = horn_align(est_t, gt_t)
    err_raw = np.linalg.norm(est_t - gt_t, axis=0)
    return {
        "rmse": float(np.sqrt(np.mean(err_aligned ** 2))),
        "mean": float(np.mean(err_aligned)),
        "median": float(np.median(err_aligned)),
        "std": float(np.std(err_aligned)),
        "min": float(np.min(err_aligned)),
        "max": float(np.max(err_aligned)),
        "rmse_no_align": float(np.sqrt(np.mean(err_raw ** 2))),
        "n": int(mask.sum()),
    }


def evaluate_from_output(output_dir: str, no_align=False, plot=False):
    from ..utils.io import load_checkpoint

    ckpts = sorted(glob.glob(os.path.join(output_dir, "ckpts", "*.pkl")))
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints under {output_dir}/ckpts")
    ck = load_checkpoint(ckpts[-1])
    n = ck["idx"] + 1
    stats = evaluate_trajectories(ck["estimate_c2w_list"][:n],
                                  ck["gt_c2w_list"][:n])
    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        est = ck["estimate_c2w_list"][:n][:, :3, 3]
        gt = ck["gt_c2w_list"][:n][:, :3, 3]
        fig, ax = plt.subplots()
        ax.plot(gt[:, 0], gt[:, 2], "k-", label="ground truth")
        ax.plot(est[:, 0], est[:, 2], "b-", label="estimated")
        ax.legend()
        ax.set_title(f"ATE RMSE {stats['rmse'] * 100:.2f} cm")
        fig.savefig(os.path.join(output_dir, "ate.png"), dpi=120)
        plt.close(fig)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--no_align", action="store_true")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()
    stats = evaluate_from_output(args.output, args.no_align, args.plot)
    key = "rmse_no_align" if args.no_align else "rmse"
    print({"absolute_translational_error.rmse": stats[key], **stats})


if __name__ == "__main__":
    main()
