"""Live checkpoint-resume: a run truncated mid-way must continue from its
checkpoint to a complete, consistent session (a capability the reference
lacks — its ckpts feed only the offline tools, SURVEY.md §5)."""

import pytest
import copy
import glob
import os

import numpy as np

from loopy_slam_tpu.slam import LoopySLAM
from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories

from conftest import small_cfg


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def test_resume_continues_to_completion(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "run")
    cfg["mapping"]["save_ckpts"] = True
    cfg["mapping"]["ckpt_freq"] = 100  # only the final/stop ckpt

    # phase 1: truncated run (stop=6 breaks at frame 6 and checkpoints)
    slam1 = LoopySLAM(copy.deepcopy(cfg), output=cfg["data"]["output"])
    slam1.run(stop=6)
    ckpts = [p for p in sorted(glob.glob(
        os.path.join(cfg["data"]["output"], "ckpts", "*.pkl")))
        if "_pgo" not in os.path.basename(p)]
    assert ckpts, "truncated run must write a checkpoint"
    n_pts_1 = int(slam1.map_state.count)
    est_prefix = slam1.estimate_c2w[:7].copy()
    assert n_pts_1 > 0

    # phase 2: fresh process state, restore, continue to the end
    slam2 = LoopySLAM(copy.deepcopy(cfg), output=str(tmp_path / "resumed"))
    start = slam2.restore(ckpts[-1])
    assert start == 7
    assert int(slam2.map_state.count) == n_pts_1
    assert slam2.kf_slots_used == slam1.kf_slots_used
    np.testing.assert_allclose(slam2.estimate_c2w[:7], est_prefix)

    # loop-closure bookkeeping must be replayed: the place-recognition
    # database indexes fragments by position, and score baselines ride
    # along (review finding: a fresh empty db would offset every query id)
    assert len(slam2.lc.db.entries) == len(slam2.fm.fragments)
    assert len(slam2.lc.dbow_scores) == len(slam1.lc.dbow_scores)

    result = slam2.run(start_idx=start)

    # the resumed session must cover the whole trajectory with a sane pose
    # estimate everywhere (rotations stay orthonormal, ATE bounded)
    n = cfg["data"]["n_frames"]
    assert result["estimate_c2w"].shape[0] == n
    for i in range(n):
        R = result["estimate_c2w"][i][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
    stats = evaluate_trajectories(result["estimate_c2w"], result["gt_c2w"])
    assert np.isfinite(stats["rmse"])
    assert stats["rmse"] < 0.05
    assert int(slam2.map_state.count) >= n_pts_1
