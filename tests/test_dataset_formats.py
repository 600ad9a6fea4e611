"""On-disk dataset format loaders, validated against generated fixtures
(no downloads): Replica traj.txt + results/frame*.jpg/depth*.png, TUM
rgb/depth/groundtruth association, ScanNet frames/pose layout."""

import os

import cv2
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.utils.datasets import (Replica, ScanNet, Synthetic,
                                           TUM_RGBD)


def _write_png_depth(path, depth, scale):
    cv2.imwrite(path, (depth * scale).astype(np.uint16))


def make_replica_fixture(root, cfg, n=3):
    os.makedirs(os.path.join(root, "results"), exist_ok=True)
    ds = Synthetic(cfg)
    scale = cfg["cam"]["png_depth_scale"]
    lines = []
    for i in range(n):
        _, color, depth, c2w = ds[i]
        bgr = cv2.cvtColor((color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(root, "results", f"frame{i:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        _write_png_depth(os.path.join(root, "results", f"depth{i:06d}.png"),
                         depth, scale)
        # invert the loader's axis flip so the loaded pose equals c2w
        raw = c2w.copy()
        raw[:3, 1] *= -1
        raw[:3, 2] *= -1
        lines.append(" ".join(f"{v:.9f}" for v in raw.reshape(-1)))
    with open(os.path.join(root, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return ds


def test_replica_loader_round_trip(tmp_path):
    cfg = small_cfg()
    root = str(tmp_path / "replica_scene")
    ds_src = make_replica_fixture(root, cfg)
    cfg2 = dict(cfg)
    cfg2["dataset"] = "replica"
    cfg2["data"] = {**cfg["data"], "input_folder": root}
    ds = Replica(cfg2)
    assert len(ds) == 3
    idx, color, depth, c2w = ds[1]
    _, c0, d0, p0 = ds_src[1]
    np.testing.assert_allclose(c2w, p0, atol=1e-5)
    assert np.abs(depth - d0).mean() < 2e-4   # uint16 quantization
    assert np.abs(color - c0).mean() < 0.03   # jpeg
    assert color.shape == (cfg["cam"]["H"], cfg["cam"]["W"], 3)


def make_tum_fixture(root, cfg, n=4):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    ds = Synthetic(cfg)
    scale = cfg["cam"]["png_depth_scale"]
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 100.0 + i * 0.1
        _, color, depth, c2w = ds[i]
        bgr = cv2.cvtColor((color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), bgr)
        _write_png_depth(os.path.join(root, "depth", f"{t:.6f}.png"), depth,
                         scale)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        # groundtruth: tx ty tz qx qy qz qw of the RAW (unflipped) pose
        raw = c2w.copy()
        raw[:3, 1] *= -1
        raw[:3, 2] *= -1
        from scipy.spatial.transform import Rotation
        q = Rotation.from_matrix(raw[:3, :3]).as_quat()
        tx, ty, tz = raw[:3, 3]
        gt_lines.append(f"{t:.6f} {tx} {ty} {tz} {q[0]} {q[1]} {q[2]} {q[3]}")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", ["# ts tx ty tz qx qy qz qw"]
                         + gt_lines)]:
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    return ds


def test_tum_loader_round_trip(tmp_path):
    cfg = small_cfg()
    root = str(tmp_path / "tum_scene")
    make_tum_fixture(root, cfg)
    cfg2 = dict(cfg)
    cfg2["dataset"] = "tumrgbd"
    cfg2["data"] = {**cfg["data"], "input_folder": root}
    ds = TUM_RGBD(cfg2)
    assert len(ds) == 4
    idx, color, depth, c2w = ds[0]
    # TUM normalizes the first pose to identity (datasets.py:312-315)
    np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3),
                               atol=1e-5)
    assert depth.shape == (cfg["cam"]["H"], cfg["cam"]["W"])
    assert (depth > 0).mean() > 0.99


def test_scannet_loader_layout(tmp_path):
    cfg = small_cfg()
    root = str(tmp_path / "scan")
    base = os.path.join(root, "frames")
    for sub in ["color", "depth", "pose"]:
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    ds_src = Synthetic(cfg)
    for i in range(2):
        _, color, depth, c2w = ds_src[i]
        bgr = cv2.cvtColor((color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(base, "color", f"{i}.jpg"), bgr)
        _write_png_depth(os.path.join(base, "depth", f"{i}.png"), depth,
                         cfg["cam"]["png_depth_scale"])
        raw = c2w.copy()
        raw[:3, 1] *= -1
        raw[:3, 2] *= -1
        np.savetxt(os.path.join(base, "pose", f"{i}.txt"), raw)
    cfg2 = dict(cfg)
    cfg2["dataset"] = "scannet"
    cfg2["data"] = {**cfg["data"], "input_folder": root}
    ds = ScanNet(cfg2)
    assert len(ds) == 2
    idx, color, depth, c2w = ds[1]
    _, _, _, p1 = ds_src[1]
    np.testing.assert_allclose(c2w, p1, atol=1e-5)
