"""Deterministic truncated-run regression (the reference's --stop mechanism,
run.py:25,35-37 + SURVEY.md §4): same seed + same config must reproduce the
same trajectory metrics across runs within float tolerance."""

import pytest
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM
from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def _run(tmp_path, tag):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / tag)
    cfg["data"]["n_frames"] = 7
    cfg["mapping"]["color_refine"] = False
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    res = slam.run(stop=6)
    return res


def test_same_seed_reproduces(tmp_path):
    r1 = _run(tmp_path, "a")
    r2 = _run(tmp_path, "b")
    np.testing.assert_allclose(r1["estimate_c2w"], r2["estimate_c2w"],
                               atol=1e-5)
    assert r1["n_points"] == r2["n_points"]
    s1 = evaluate_trajectories(r1["estimate_c2w"], r1["gt_c2w"])
    s2 = evaluate_trajectories(r2["estimate_c2w"], r2["gt_c2w"])
    assert abs(s1["rmse"] - s2["rmse"]) < 1e-6
