"""End-to-end submaps: segment switches, carry-over, TSDF registration
clouds, ORB baselines, and the loop-closure correction path."""

import pytest
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.slam import LoopySLAM
from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories


pytestmark = pytest.mark.slow  # full SLAM session (compile-bound)

def test_multisegment_run(tmp_path):
    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["data"]["n_frames"] = 17
    cfg["cam"].update({"H": 120, "W": 160, "fx": 120.0, "fy": 120.0,
                       "cx": 79.5, "cy": 59.5})
    cfg["tracking"].update({"pixels": 300, "iters": 10, "filter": False,
                            "kval": 3, "min_dist": 1,
                            "global_iter": 3000, "dbow_filter": False})
    cfg["mapping"].update({
        "color_refine": False, "iters": 16, "iters_first": 40,
        "geo_iter_first": 15, "every_frame": 2, "keyframe_every": 2,
        # tiny thresholds so the gentle synthetic motion forms segments
        "segment_rel_trans": 0.025, "segment_rot_cos": 0.9999,
    })
    cfg["meshing"]["registration_voxel"] = 0.03
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    result = slam.run()

    # several segments must have formed and been archived
    assert len(slam.fm.fragments) >= 3, len(slam.fm.fragments)
    closed = slam.fm.fragments[:-1]
    for f in closed:
        assert f.npc is not None and len(f.npc) > 0
        assert f.carry_mask is not None
        # TSDF registration cloud replaced the raw sensor points
        assert f.reg_points is not None and len(f.reg_points) > 100
    # ORB baselines were computed at each boundary
    assert len(slam.lc.dbow_scores) == len(closed)

    # trajectory remains sane through segment switches; gate at ~3x the
    # measured value (BASELINE.md e2e gate table) per round-3 verdict #5
    stats = evaluate_trajectories(result["estimate_c2w"], result["gt_c2w"])
    print("multisegment_e2e stats:", stats)
    assert stats["rmse"] < 0.02, stats

    # the global merge produces a consistent cloud (duplicate averaging)
    import jax.numpy as jnp

    s = slam.map_state
    cnt = int(s.count)
    c_dim = slam.mopts_map.c_dim
    feat = np.asarray(s.feat[:cnt])
    npc, geo, col = slam.fm.merged_global(
        np.asarray(s.pos[:cnt]), feat[:, :c_dim], feat[:, c_dim:])
    assert len(npc) == len(geo) == len(col)
    total_raw = sum(len(f.npc) for f in closed) + cnt
    assert 0 < len(npc) <= total_raw
