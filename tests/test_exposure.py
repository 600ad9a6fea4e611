"""Exposure-compensation path (ScanNet config: model.encode_exposure)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM


def test_e2e_with_exposure(tmp_path):
    cfg = small_cfg()
    cfg["model"]["encode_exposure"] = True
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 5
    cfg["mapping"]["color_refine"] = False
    cfg["mapping"]["iters"] = 20
    cfg["mapping"]["iters_first"] = 30
    cfg["tracking"]["iters"] = 8
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    result = slam.run()
    assert result["n_points"] > 200
    # exposure latent moved away from init (it is being optimized)
    assert np.isfinite(np.asarray(slam.exposure_feat)).all()
    from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories
    stats = evaluate_trajectories(result["estimate_c2w"], result["gt_c2w"])
    assert stats["rmse"] < 0.1
