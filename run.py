#!/usr/bin/env python
"""CLI entry point, drop-in equivalent of the reference run.py:11-45:

    python run.py configs/Synthetic/room.yaml [--input_folder X] [--output Y]
                  [--stop N] [--wandb/--no_wandb]
"""

import argparse
import random


def main():
    # heavy imports deferred so spawned registration-pool workers, which
    # re-import this file as __main__ (spawn context), don't each pay the
    # full slam -> jax import chain
    import numpy as np

    from loopy_slam_tpu.config import load_config
    from loopy_slam_tpu.slam import LoopySLAM

    parser = argparse.ArgumentParser(description="loopy_slam_tpu runner")
    parser.add_argument("config", type=str, help="path to scene config yaml")
    parser.add_argument("--input_folder", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--stop", type=int, default=0,
                        help="deterministic truncation for regression runs")
    parser.add_argument("--resume", type=str, default=None, nargs="?",
                        const="auto",
                        help="resume a live run from a checkpoint: a .pkl "
                             "path, or bare --resume for the latest ckpt "
                             "in <output>/ckpts")
    parser.add_argument("--wandb", dest="wandb", action="store_true")
    parser.add_argument("--no_wandb", dest="wandb", action="store_false")
    parser.set_defaults(wandb=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.input_folder is not None:
        cfg["data"]["input_folder"] = args.input_folder
    if args.output is not None:
        cfg["data"]["output"] = args.output
    if args.wandb is not None:
        cfg["wandb"] = args.wandb
    if args.stop:
        cfg["stop"] = args.stop
        cfg["mapping"]["ckpt_freq"] = args.stop
        cfg["mapping"]["keyframe_every"] = min(
            cfg["mapping"]["keyframe_every"], args.stop)

    random.seed(cfg["setup_seed"])
    np.random.seed(cfg["setup_seed"])

    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    start_idx = 0
    if args.resume:
        import glob
        import os
        path = args.resume
        if path == "auto":
            cands = [p for p in sorted(glob.glob(
                os.path.join(slam.output, "ckpts", "*.pkl")))
                if "_pgo" not in os.path.basename(p)]
            if not cands:
                raise SystemExit(
                    f"--resume: no checkpoints in {slam.output}/ckpts")
            path = cands[-1]
        start_idx = slam.restore(path)
    result = slam.run(stop=cfg.get("stop", 0), start_idx=start_idx)

    # end-of-run evaluation (reference Mapper.py:1056-1218): ATE, render
    # metrics, mesh reconstruction metrics. Guarded like the reference
    # (Mapper.py:1074-1077): an eval crash must not lose the run — the
    # final checkpoint was already written by slam.finalize() inside run().
    try:
        from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories
        stats = evaluate_trajectories(result["estimate_c2w"],
                                      result["gt_c2w"])
        print("ATE RMSE (aligned, m):", stats["rmse"])
        print("ATE RMSE (no-align, m):", stats["rmse_no_align"])
        if not cfg.get("stop") and (cfg["rendering"]["eval_img"]
                                    or cfg["meshing"]["eval_rec"]):
            eval_stats = slam.final_eval()
            print("final eval:", eval_stats)
    except Exception:
        import traceback
        traceback.print_exc()
        print("evaluation failed; the run itself is preserved — final "
              f"checkpoint is in {slam.output}/ckpts (rerun eval via "
              "loopy_slam_tpu.tools.eval_ate / get_mesh_tsdf_fusion)")


if __name__ == "__main__":
    main()
