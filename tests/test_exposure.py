"""Exposure-compensation path (ScanNet config: model.encode_exposure)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

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

    # per-mapped-frame color-decoder snapshots were written (reference
    # Mapper.py:798-802) and final_eval re-renders under them
    import os
    cd_dir = os.path.join(cfg["data"]["output"], "ckpts", "color_decoder")
    snaps = sorted(os.listdir(cd_dir))
    assert "00000.pkl" in snaps and "00004.pkl" in snaps, snaps
    assert set(slam.mapped_exposure) == {0, 2, 4}
    eval_stats = slam.final_eval(every=2, save_renders=False, n_2d_views=0)
    assert np.isfinite(eval_stats["psnr"]) and eval_stats["psnr"] > 10
