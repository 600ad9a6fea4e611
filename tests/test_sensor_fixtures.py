"""End-to-end SLAM on TUM- and ScanNet-format fixtures (tiny geometry).

Exercises the real-sensor code paths the Replica-format fixture cannot
(VERDICT r2 missing #3): radial distortion + cv2.undistort, TUM timestamp
association with dropped depth frames, crop_edge, dynamic query radius,
sample-with-color-grad pixel selection, zero-depth holes with the
sample_near_pcl ray path (reference src/utils/Renderer.py:151-163; the
reference's base config enables it, configs/point_slam.yaml:127), ScanNet
exposure encoding, and invalid (inf) GT poses.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import small_cfg
from loopy_slam_tpu.config import load_config, update_recursive
from loopy_slam_tpu.slam import LoopySLAM
from loopy_slam_tpu.tools.eval_ate import evaluate_trajectories

pytestmark = pytest.mark.slow  # full SLAM sessions (compile-bound)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_fixture(fmt, out, frames, scale):
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "make_sensor_fixtures.py"),
         "--format", fmt, "--out", str(out), "--frames", str(frames),
         "--scale", str(scale), "--motion-speed", str(1.0 / 60)],
        check=True, capture_output=True, text=True)


def _shrink(cfg):
    """Tiny iteration/pixel budgets so the session runs on CPU."""
    update_recursive(cfg, {
        "wandb": False, "verbose": False,
        "tracking": {"pixels": 200, "iters": 12},
        "mapping": {
            "pixels": 400, "pixels_adding": 800,
            "pixels_based_on_color_grad": 50,
            "iters": 30, "iters_first": 60, "geo_iter_first": 20,
            "mapping_window_size": 4, "keyframe_every": 2,
            "color_refine": False, "save_rendered_image": False,
            "save_ckpts": False, "vis_freq": 10000,
        },
        "pointcloud": {
            "capacity": 2 ** 15, "cell_table_size": 2 ** 16,
            "max_per_cell": 24,
        },
        "meshing": {"eval_rec": False},
    })
    return cfg


def test_tum_fixture_e2e(tmp_path):
    fix = tmp_path / "tum"
    _gen_fixture("tum", fix, frames=20, scale=4)
    cfg = load_config(os.path.join(REPO,
                                   "configs/TUM_RGBD/freiburg1_desk.yaml"))
    # scaled freiburg1 geometry (scale_cam(TUM_CAM, 4)); distortion
    # coefficients are resolution-independent
    update_recursive(cfg, {
        "cam": {"H": 120, "W": 160, "fx": 517.3 / 4, "fy": 516.5 / 4,
                "cx": (318.6 + 0.5) / 4 - 0.5, "cy": (255.3 + 0.5) / 4 - 0.5,
                "crop_edge": 2, "crop_size": None},
        "data": {"input_folder": str(fix), "output": str(tmp_path / "out")},
        # the reference's base config runs with sample_near_pcl True
        # (configs/point_slam.yaml:127); the fixture's zero-depth holes
        # drive that path every frame
        "rendering": {"sample_near_pcl": True},
        "tracking": {"ignore_edge_W": 4, "ignore_edge_H": 4},
    })
    cfg = _shrink(cfg)
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    res = slam.run()
    est, gt = res["estimate_c2w"], res["gt_c2w"]
    assert est.shape[0] >= 10  # association kept most frames
    # the dataset really contains zero-depth holes (sample_near_pcl path
    # is compiled in and runs on those rays every tracked/mapped frame)
    _, _, depth, _ = slam.dataset[2]
    assert float((depth == 0).mean()) > 0.005
    stats = evaluate_trajectories(est, gt)
    # tiny budgets on distorted real-format input: centimeter-class, not
    # collapsed (a conversion/undistort bug costs meters here)
    assert stats["rmse"] < 0.06, stats
    assert res["n_points"] > 300


def test_scannet_fixture_e2e(tmp_path):
    fix = tmp_path / "scannet"
    _gen_fixture("scannet", fix, frames=16, scale=4)
    cfg = load_config(os.path.join(REPO, "configs/ScanNet/scannet.yaml"))
    update_recursive(cfg, {
        "cam": {"H": 120, "W": 160, "fx": 577.6 / 4, "fy": 578.7 / 4,
                "cx": (319.5 + 0.5) / 4 - 0.5, "cy": (239.5 + 0.5) / 4 - 0.5,
                "crop_edge": 2, "crop_size": None},
        "data": {"input_folder": str(fix), "output": str(tmp_path / "out")},
        "tracking": {"ignore_edge_W": 4, "ignore_edge_H": 4},
    })
    cfg = _shrink(cfg)
    assert cfg["model"]["encode_exposure"] is True  # scannet.yaml keeps it
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])
    res = slam.run()
    est, gt = res["estimate_c2w"], res["gt_c2w"]
    # one pose in the fixture is inf: evaluation masks it instead of dying
    finite = np.isfinite(gt).all(axis=(1, 2))
    assert finite.sum() >= est.shape[0] - 2
    stats = evaluate_trajectories(est, gt)
    assert np.isfinite(stats["rmse"])
    assert stats["rmse"] < 0.06, stats
    assert res["n_points"] > 300
