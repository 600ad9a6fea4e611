import os

import numpy as np
import yaml

from loopy_slam_tpu.config import load_config, DEFAULTS
from loopy_slam_tpu.utils.datasets import Synthetic, get_dataset

from conftest import small_cfg


def test_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    mid = tmp_path / "mid.yaml"
    leaf = tmp_path / "leaf.yaml"
    base.write_text(yaml.dump({"tracking": {"lr": 0.5, "iters": 7}}))
    mid.write_text(yaml.dump({"inherit_from": str(base),
                              "tracking": {"iters": 9},
                              "mapping": {"pixels": 123}}))
    leaf.write_text(yaml.dump({"inherit_from": str(mid),
                               "mapping": {"pixels": 456}}))
    cfg = load_config(str(leaf))
    assert cfg["tracking"]["lr"] == 0.5          # from base
    assert cfg["tracking"]["iters"] == 9         # mid overrides base
    assert cfg["mapping"]["pixels"] == 456       # leaf overrides mid
    # defaults still present underneath
    assert cfg["pointcloud"]["nn_num"] == DEFAULTS["pointcloud"]["nn_num"]


def test_repo_configs_load():
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for rel in ["Replica/room0.yaml", "TUM_RGBD/freiburg1_desk.yaml",
                "ScanNet/scene0000.yaml", "Synthetic/room.yaml"]:
        p = os.path.join(root, rel)
        cfg = load_config(p)
        assert cfg["cam"]["H"] > 0 and cfg["mapping"]["iters"] > 0


def test_synthetic_dataset_geometry():
    cfg = small_cfg()
    ds = Synthetic(cfg)
    idx, color, depth, c2w = ds[0]
    assert color.shape == (60, 80, 3) and depth.shape == (60, 80)
    assert (depth > 0).all() and depth.max() < 10.0
    assert color.min() >= 0 and color.max() <= 1
    # depth consistency: unproject with the dataset convention and verify
    # points lie on the box surface
    H, W = depth.shape
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack([(i - cfg["cam"]["cx"]) / cfg["cam"]["fx"],
                     -(j - cfg["cam"]["cy"]) / cfg["cam"]["fy"],
                     -np.ones_like(i, float)], -1)
    pts = (dirs @ c2w[:3, :3].T) * depth[..., None] + c2w[:3, 3]
    lo, hi = ds.box_lo, ds.box_hi
    on_wall = np.zeros(pts.shape[:2], bool)
    for a in range(3):
        on_wall |= np.isclose(pts[..., a], lo[a], atol=1e-3)
        on_wall |= np.isclose(pts[..., a], hi[a], atol=1e-3)
    # non-wall pixels must lie on an interior object's surface
    on_obj = np.zeros(pts.shape[:2], bool)
    for row in Synthetic._BOXES:
        blo, bhi = row[:3], row[3:]
        near = ((pts > blo - 1e-3) & (pts < bhi + 1e-3)).all(-1)
        face = np.zeros(pts.shape[:2], bool)
        for a in range(3):
            face |= np.isclose(pts[..., a], blo[a], atol=1e-3)
            face |= np.isclose(pts[..., a], bhi[a], atol=1e-3)
        on_obj |= near & face
    for row in Synthetic._SPHERES:
        r = np.linalg.norm(pts - row[:3], axis=-1)
        on_obj |= np.isclose(r, row[3], atol=1e-3)
    assert (on_wall | on_obj).mean() > 0.999
    inside = ((pts > lo - 1e-3) & (pts < hi + 1e-3)).all(-1)
    assert inside.all()


def test_get_dataset_dispatch():
    cfg = small_cfg()
    ds = get_dataset(cfg)
    assert isinstance(ds, Synthetic)
    assert len(ds) == cfg["data"]["n_frames"]
