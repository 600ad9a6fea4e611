#!/usr/bin/env python
"""Benchmark: steady-state tracking+mapping throughput on a Replica-like
synthetic scene, on whatever accelerator JAX exposes (TPU under the driver).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline note: the reference repo publishes no numbers (BASELINE.md); the
reference system (Point-SLAM/Loopy-SLAM family) is commonly measured at
~0.3-0.4 frames/s end-to-end on a desktop CUDA GPU on Replica-class scenes.
vs_baseline uses 0.33 fps as the documented stand-in until the driver
records a measured reference value.

Extra diagnostics (Mrays/s, ATE, per-phase times) go to stderr.
"""

import json
import os
import sys
import time

# the persistent compile cache lives in <repo>/.cache/jax (set by
# loopy_slam_tpu.__init__) so warm compiles survive across sessions

import numpy as np  # noqa: E402

BASELINE_FPS = 0.33


def main():
    import jax

    from loopy_slam_tpu.config import load_config
    from loopy_slam_tpu.slam import LoopySLAM
    from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories

    cfg = load_config(os.path.join(os.path.dirname(__file__),
                                   "configs/Synthetic/room.yaml"))
    cfg["data"]["n_frames"] = int(os.environ.get("BENCH_FRAMES", 31))
    cfg["data"]["output"] = "/tmp/loopy_bench_out"
    cfg["verbose"] = False
    cfg["mapping"]["color_refine"] = False
    if os.environ.get("BENCH_OVERRIDES"):
        # ablation hook: BENCH_OVERRIDES='{"tracking": {"knn_refresh": 0}}'
        from loopy_slam_tpu.config import update_recursive

        update_recursive(cfg, json.loads(os.environ["BENCH_OVERRIDES"]))

    t_setup = time.perf_counter()
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    t_run = time.perf_counter()
    result = slam.run()
    t_done = time.perf_counter()
    total = t_done - t_setup
    print(f"setup: {t_run - t_setup:.1f}s  run: {t_done - t_run:.1f}s  "
          f"phases: " + " ".join(
              f"{k}={sum(v):.1f}s" for k, v in slam.timings.items()),
          file=sys.stderr)

    track = np.array(slam.timings["track"])
    mp = np.array(slam.timings["map"])
    every = cfg["mapping"]["every_frame"]
    # steady state: drop compile-dominated leading calls (first tracked
    # frame; first two mapped frames — frame 0 and the first frame that
    # compiles the overlap-split insertion variants)
    t_track = float(np.median(track[1:])) if track.size > 1 else (
        float(track.mean()) if track.size else 0.0)
    steady_mp = mp[2:] if mp.size > 2 else mp
    # median: robust to one-time events inside a mapped frame (first
    # segment boundary compiles the TSDF integrate program once per process)
    t_map = float(np.median(steady_mp)) if steady_mp.size else 0.0
    per_frame = t_track + t_map / every
    steady_fps = 1.0 / per_frame if per_frame > 0 else 0.0

    # rendered-ray throughput during tracking (forward+backward per iter)
    rays_per_track = cfg["tracking"]["pixels"] * cfg["tracking"]["iters"]
    mrays = rays_per_track / t_track / 1e6 if t_track > 0 else 0.0

    # HEADLINE (round-4 verdict): honest amortized throughput over the
    # whole process wall — setup, compiles, loop closure, everything.
    # The median-based steady-state number above structurally hid the
    # segment-boundary cost (r4: 1.78 "fps" vs 0.18 amortized); it stays
    # as a diagnostic only.
    amortized_fps = cfg["data"]["n_frames"] / total if total > 0 else 0.0

    # MFU / roofline (round-4 verdict): XLA's per-execution cost of the
    # exact hot programs, vs measured wall. Peaks: TPU v5e (v5 lite):
    # 197e12 bf16 FLOP/s, 819e9 B/s HBM. The map program is one
    # device_chunk_iters chunk; a steady mapped frame runs iters/chunk of
    # them, so achieved = flops * chunks_per_frame / map_median.
    mfu = {}
    try:
        PEAK_FLOPS, PEAK_BW = 197e12, 819e9
        rl = slam.roofline()
        if "track" in rl and t_track > 0:
            f = rl["track"]
            mfu["mfu_track"] = round(f["flops"] / t_track / PEAK_FLOPS, 4)
            mfu["hbm_frac_track"] = round(f["bytes"] / t_track / PEAK_BW, 4)
            mfu["track_gflops_per_exec"] = round(f["flops"] / 1e9, 2)
        if "map" in rl and t_map > 0:
            f = rl["map"]
            chunks = max(round(cfg["mapping"]["iters"]
                               / f.get("chunk_iters", 64)), 1)
            mfu["mfu_map"] = round(f["flops"] * chunks / t_map
                                   / PEAK_FLOPS, 4)
            mfu["hbm_frac_map"] = round(f["bytes"] * chunks / t_map
                                        / PEAK_BW, 4)
            mfu["map_gflops_per_chunk"] = round(f["flops"] / 1e9, 2)
            mfu["map_gbytes_per_chunk"] = round(f["bytes"] / 1e9, 3)
    except Exception as e:  # accounting must never fail the bench
        mfu["mfu_error"] = repr(e)

    stats = evaluate_trajectories(result["estimate_c2w"], result["gt_c2w"])
    print(json.dumps({
        "track_times": [round(t, 3) for t in track.tolist()],
        "map_times": [round(t, 3) for t in mp.tolist()],
        "devices": [str(d) for d in jax.devices()],
        "frames": int(cfg["data"]["n_frames"]),
        "wall_total_s": round(total, 2),
        "steady_state_fps": round(steady_fps, 4),
        "track_median_s": round(t_track, 4),
        "map_median_s": round(t_map, 4),
        "track_mrays_per_s": round(mrays, 3),
        "ate_rmse_m": round(stats["rmse"], 5),
        "ate_rmse_noalign_m": round(stats["rmse_no_align"], 5),
        "n_points": result["n_points"],
        "health_rejects": int(np.asarray(slam.track_health)[1]),
        **mfu,
    }), file=sys.stderr)

    print(json.dumps({
        "metric": "synthetic_room_amortized_fps",
        "value": round(amortized_fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(amortized_fps / BASELINE_FPS, 3),
    }))

    # executable quality gate (round-3): speed only counts AT matched
    # accuracy — round 2 shipped a 1.7x fps win that silently cost 7x ATE.
    # The gate makes that trade loud: bench FAILS if the bench-scene ATE
    # exceeds the gate (r01/r03 measured ~0.0010-0.0015 m).
    gate = float(os.environ.get("BENCH_ATE_GATE_M", 0.002))
    if stats["rmse"] > gate:
        print(f"QUALITY GATE FAILED: ate_rmse_m {stats['rmse']:.5f} > "
              f"{gate} — fps above is NOT at matched accuracy",
              file=sys.stderr)
        sys.exit(1)
    # health-gate false-positive gate (round-3 verdict weak #4): the bench
    # scene is healthy end to end, so ANY rejected pose update is a gate
    # miscalibration, caught here instead of inside a 10-hour flagship run
    rejects = int(np.asarray(slam.track_health)[1])
    if rejects > 0:
        print(f"HEALTH GATE FALSE POSITIVE: {rejects} pose updates rejected "
              "on the healthy bench scene", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
