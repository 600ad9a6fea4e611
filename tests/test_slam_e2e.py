"""End-to-end: full SLAM loop on the tiny synthetic scene.

The golden-output role of the reference's `--stop` mechanism (SURVEY.md §4):
deterministic seeds, truncated run, metric thresholds.
"""

import pytest
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM
from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def test_e2e_synthetic(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 9
    cfg["mapping"]["color_refine"] = False
    # exercise the periodic residual-panel dumps (reference
    # Visualizer.vis gating, Tracker.py:385-390 / Mapper.py:766)
    cfg["tracking"]["vis_freq"] = 5
    cfg["mapping"]["vis_freq"] = 4
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    result = slam.run()

    assert result["n_points"] > 500
    est, gt = result["estimate_c2w"], result["gt_c2w"]
    assert est.shape == gt.shape == (9, 4, 4)
    stats = evaluate_trajectories(est, gt)
    print("e2e_synthetic stats:", stats)
    # gate at ~3x the measured value (r4 measured: rmse 0.0084 /
    # no-align 0.0134 on this 9-frame tiny-budget scene; BASELINE.md e2e
    # gate table) so a deliberate regression fails CI instead of a
    # 10-hour flagship run (round-3 verdict weak #5: 5 cm was ~6x)
    assert stats["rmse"] < 0.025, stats
    assert stats["rmse_no_align"] < 0.04, stats

    # outputs written
    import os
    assert os.path.exists(os.path.join(cfg["data"]["output"],
                                       "final_point_cloud.ply"))
    ckpts = os.listdir(os.path.join(cfg["data"]["output"], "ckpts"))
    assert len(ckpts) == 1

    # residual panels fired at vis_freq boundaries (idx>0, idx%freq==0)
    tvis = os.listdir(os.path.join(cfg["data"]["output"], "tracking_vis"))
    mvis = os.listdir(os.path.join(cfg["data"]["output"], "mapping_vis"))
    assert any(f.startswith("00005_") for f in tvis), tvis
    assert any(f.startswith("00004_") for f in mvis), mvis
    assert any(f.startswith("00008_") for f in mvis), mvis

    # eval tool consumes the checkpoint
    from loopy_slam_tpu.tools.eval_ate import evaluate_from_output
    stats2 = evaluate_from_output(cfg["data"]["output"])
    assert abs(stats2["rmse"] - stats["rmse"]) < 1e-9
