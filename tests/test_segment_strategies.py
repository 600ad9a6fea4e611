"""Segment strategy variants: 'fixed' size and disabled ('none')."""

import pytest
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def test_fixed_segment_strategy(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 13
    cfg["mapping"].update({"segment_strategy": "fixed",
                           "fixed_segment_size": 4,
                           "iters": 10, "iters_first": 20,
                           "geo_iter_first": 8,
                           "color_refine": False, "every_frame": 2})
    cfg["meshing"]["registration_voxel"] = 0.05
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    slam.run()
    # mapped frames 0,2,4,...: new fragments at 0, 4, 8, 12
    starts = [f.start_idx for f in slam.fm.fragments]
    assert starts == [0, 4, 8, 12], starts


def test_segments_disabled(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 7
    cfg["mapping"].update({"segment_strategy": "none", "iters": 10,
                           "iters_first": 20, "geo_iter_first": 8,
                           "color_refine": False})
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    res = slam.run()
    assert len(slam.fm.fragments) == 0
    assert res["n_points"] > 100
