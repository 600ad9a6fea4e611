"""Mesh fly-through tool (tools/get_mesh_video): headless shaded render
of a PLY mesh along orbit poses (reference get_mesh_video.py:94-399)."""

import numpy as np
import pytest

from loopy_slam_tpu.tools.get_mesh_video import (orbit_poses,
                                                 render_mesh_frames,
                                                 shade_depth)
from loopy_slam_tpu.utils.io import write_ply_mesh


def test_mesh_video_orbit(tmp_path):
    pytest.importorskip("imageio")
    from loopy_slam_tpu.native.build import get_lib
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    # a unit cube mesh
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                  for z in (0, 1)], np.float32)
    f = []
    for axis in range(3):
        for side in (0, 1):
            idx = [i for i in range(8) if (i >> (2 - axis)) & 1 == side]
            f += [[idx[0], idx[1], idx[2]], [idx[1], idx[3], idx[2]]]
    faces = np.asarray(f, np.int32)
    out = tmp_path / "run"
    (out / "mesh").mkdir(parents=True)
    write_ply_mesh(str(out / "mesh" / "final_mesh.ply"), v, faces)
    paths, _ = render_mesh_frames(str(out), orbit=True, H=60, W=80,
                                  f=60.0)
    assert len(paths) == 72
    import imageio.v2 as imageio
    img = imageio.imread(paths[0])
    assert img.shape[:2] == (60, 80)
    assert img.max() > 30  # something shaded is visible


def test_shade_depth_flat_wall():
    d = np.full((32, 32), 2.0, np.float32)
    s = shade_depth(d, 60.0, 60.0)
    assert s.min() > 0.5  # head-on flat wall is bright


def test_orbit_poses_look_at_center():
    c = np.array([1.0, 2.0, 3.0])
    for p in orbit_poses(c, 2.0, 0.5, 8):
        fwd = -p[:3, 2]
        to_c = c - p[:3, 3]
        to_c /= np.linalg.norm(to_c)
        assert np.dot(fwd, to_c) > 0.99
