"""First-party EXR codec (utils/exr.py) + CoFusion loader round trip."""

import copy

import numpy as np
import pytest

from loopy_slam_tpu.utils.exr import read_exr, read_exr_depth, write_exr


@pytest.mark.parametrize("compression", ["NONE", "ZIPS", "ZIP"])
@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_exr_round_trip(tmp_path, compression, dtype):
    rng = np.random.default_rng(0)
    # odd height exercises the partial last ZIP block (16-line blocks)
    depth = (rng.uniform(0.2, 5.0, (37, 53))).astype(dtype)
    path = str(tmp_path / f"d_{compression}.exr")
    write_exr(path, {"Y": depth}, compression=compression)
    back = read_exr_depth(path)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, depth.astype(np.float32))


def test_exr_multichannel_and_missing_y(tmp_path):
    rng = np.random.default_rng(1)
    r = rng.uniform(0, 1, (20, 31)).astype(np.float32)
    g = rng.uniform(0, 1, (20, 31)).astype(np.float16)
    path = str(tmp_path / "rgb.exr")
    write_exr(path, {"R": r, "G": g})
    chans = read_exr(path)
    np.testing.assert_array_equal(chans["R"], r)
    np.testing.assert_array_equal(chans["G"], g)
    # no 'Y' channel -> None, the reference readEXR_onlydepth contract
    assert read_exr_depth(path) is None


def test_exr_rejects_non_exr(tmp_path):
    path = str(tmp_path / "bogus.exr")
    with open(path, "wb") as f:
        f.write(b"not an exr at all")
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(path)


def test_cofusion_loader_reads_exr_depth(tmp_path, cfg):
    """The CoFusion glob (colour/*.png + depth_noise/*.exr) must load end
    to end — the round-1 loader crashed on its own glob (VERDICT #7)."""
    import cv2

    from loopy_slam_tpu.utils.datasets import get_dataset

    root = tmp_path / "cofusion"
    (root / "colour").mkdir(parents=True)
    (root / "depth_noise").mkdir()
    rng = np.random.default_rng(2)
    H, W = 24, 32
    depths = []
    for i in range(3):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "colour" / f"Color{i:04d}.png"), img)
        d = rng.uniform(0.5, 4.0, (H, W)).astype(np.float32)
        depths.append(d)
        write_exr(str(root / "depth_noise" / f"Depth{i:04d}.exr"), {"Y": d})

    c = copy.deepcopy(cfg)
    c["dataset"] = "cofusion"
    c["cam"].update({"H": H, "W": W, "png_depth_scale": 1.0})
    ds = get_dataset(c, input_folder=str(root))
    assert len(ds) == 3
    idx, color, depth, c2w = ds[1]
    assert color.shape == (H, W, 3)
    np.testing.assert_allclose(depth, depths[1], atol=1e-6)
    np.testing.assert_array_equal(c2w, np.eye(4, dtype=np.float32))
