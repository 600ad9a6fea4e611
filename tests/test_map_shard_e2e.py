"""End-to-end SLAM with the map cell-sharded across the 8-device CPU mesh
(config parallel.map_shard) — VERDICT r1 item #4: sharded insertion,
capacity growth, and the full tracking/mapping loop over ring-collective
k-NN must run inside LoopySLAM, not just as parity-tested primitives.
"""

import jax
import numpy as np
import pytest

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM


pytestmark = pytest.mark.slow


def _shard_cfg(tmp_path, **over):
    cfg = small_cfg(**over)
    cfg["parallel"]["map_shard"] = True
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["mapping"]["color_refine"] = False
    return cfg


def test_map_shard_e2e(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _shard_cfg(tmp_path)
    cfg["data"]["n_frames"] = 9
    # tiny initial capacity so per-shard growth triggers mid-run
    cfg["pointcloud"]["initial_capacity"] = 4096
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    assert slam.shard_mesh is not None
    result = slam.run()

    assert result["n_points"] > 500
    counts = np.asarray(slam._smap.count)
    assert counts.sum() == result["n_points"]
    assert (counts > 0).sum() >= 6  # hash ownership spreads the load

    from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories
    stats = evaluate_trajectories(result["estimate_c2w"], result["gt_c2w"])
    assert stats["rmse"] < 0.05, stats

    # snapshot gather agrees with the sharded buffers
    slam._sync_eval_state()
    assert int(slam.map_state.count) == result["n_points"]

    # final eval renders from the gathered snapshot
    eval_stats = slam.final_eval(every=4, save_renders=False, n_2d_views=0)
    assert np.isfinite(eval_stats["psnr"]) and eval_stats["psnr"] > 10


def test_map_shard_matches_single_device_quality(tmp_path):
    """The sharded session must reach the same quality band as the
    single-device run on the identical scene (not bit-identical: ray
    sampling decorrelates per shard by design)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories

    cfg = _shard_cfg(tmp_path, data={"n_frames": 7})
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    res = slam.run()
    sh = evaluate_trajectories(res["estimate_c2w"], res["gt_c2w"])

    cfg1 = small_cfg(data={"n_frames": 7,
                           "output": str(tmp_path / "out1")})
    cfg1["mapping"]["color_refine"] = False
    slam1 = LoopySLAM(cfg1, output=cfg1["data"]["output"])
    res1 = slam1.run()
    s1 = evaluate_trajectories(res1["estimate_c2w"], res1["gt_c2w"])

    assert sh["rmse"] < max(3.0 * s1["rmse"], 0.03), (sh, s1)
