"""End-of-run evaluation: renders, mesh fusion, recon metrics vs analytic
ground truth on the synthetic scene."""

import pytest
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def test_final_eval_pipeline(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 7
    cfg["mapping"]["color_refine"] = False
    cfg["meshing"]["eval_rec"] = True
    cfg["meshing"]["mesh_voxel"] = 0.08
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    slam.run()
    stats = slam.final_eval(every=3, save_renders=True, n_2d_views=5)
    assert np.isfinite(stats["psnr"]) and stats["psnr"] > 12, stats
    assert 0 < stats["ms_ssim"] <= 1
    assert stats["depth_l1"] < 0.2, stats
    # mesh recon vs the analytic box mesh
    assert "accuracy" in stats, stats
    assert stats["accuracy"] < 15, stats        # cm
    assert stats["completion ratio"] > 20, stats
    assert np.isfinite(stats["depth l1"]), stats
    import os
    assert os.path.exists(os.path.join(cfg["data"]["output"], "mesh",
                                       "final_mesh.ply"))
    assert os.path.exists(os.path.join(cfg["data"]["output"],
                                       "rendered_every_frame",
                                       "color_00000.npy"))
