"""Native C++ kernels vs numpy oracles."""

import numpy as np
import pytest

from loopy_slam_tpu.native.build import (get_lib, hamming_mutual_match_count,
                                         march_tets_native)
from loopy_slam_tpu.mapping import place_recognition as pr


@pytest.fixture(scope="module")
def lib():
    l = get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_hamming_matches_numpy_oracle(lib, rng):
    a = rng.integers(0, 256, (120, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (90, 32), dtype=np.uint8)
    # seed known matches
    b[:40] = a[:40]
    got = hamming_mutual_match_count(a, b, 64)
    # numpy oracle (the pure-python path in place_recognition)
    d = pr._hamming(a, b)
    nn_ab = d.argmin(1)
    nn_ba = d.argmin(0)
    ia = np.arange(len(a))
    mutual = nn_ba[nn_ab] == ia
    good = mutual & (d[ia, nn_ab] < 64)
    assert got == int(good.sum())
    assert got >= 40


def test_match_score_uses_same_scale(lib, rng):
    a = rng.integers(0, 256, (100, 32), dtype=np.uint8)
    s_same = pr.match_score(a, a.copy())
    assert s_same == 1.0
    b = rng.integers(0, 256, (100, 32), dtype=np.uint8)
    assert pr.match_score(a, b) < 0.3


def test_march_tets_matches_numpy(lib):
    # sphere SDF on a small grid
    n = 24
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    vol = (np.sqrt(x**2 + y**2 + z**2) - 0.6).astype(np.float32)
    tris = march_tets_native(vol)
    assert tris is not None and len(tris) > 100
    # every triangle vertex lies near the zero level set
    c = (tris / (n - 1)) * 2 - 1
    r = np.linalg.norm(c.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.08)


def test_extract_mesh_native_and_numpy_agree(rng, monkeypatch):
    import jax.numpy as jnp

    from loopy_slam_tpu.ops import tsdf

    H, W = 40, 50
    depth = np.full((H, W), 1.5, np.float32)
    color = rng.uniform(size=(H, W, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    grid = tsdf.fuse_frames([(color, depth)], [c2w], 40.0, 40.0, 24.5, 19.5,
                            voxel=0.05, trunc=0.15)
    v1, f1, _ = tsdf.extract_mesh(grid)

    import loopy_slam_tpu.native.build as nb
    monkeypatch.setattr(nb, "march_tets_native", lambda vol: None)
    v2, f2, _ = tsdf.extract_mesh(grid)
    # same surface: compare vertex sets
    assert abs(len(v1) - len(v2)) < max(len(v1), len(v2)) * 0.01
    from scipy.spatial import cKDTree
    d, _ = cKDTree(v2).query(v1)
    assert d.max() < 1e-4
