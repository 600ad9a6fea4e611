import jax.numpy as jnp
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.ops import tsdf
from loopy_slam_tpu.utils.datasets import Synthetic


def test_integrate_extract_sphere():
    """Analytic SDF check: fuse depth of a flat wall, extract, verify plane."""
    H, W = 60, 80
    fx = fy = 60.0
    cx, cy = 39.5, 29.5
    depth = np.full((H, W), 2.0, np.float32)
    color = np.tile(np.array([0.2, 0.5, 0.8], np.float32), (H, W, 1))
    c2w = np.eye(4, dtype=np.float32)  # camera at origin, looking down -z
    grid = tsdf.fuse_frames([(color, depth)], [c2w], fx, fy, cx, cy,
                            voxel=0.05, trunc=0.15)
    verts, faces, colors = tsdf.extract_mesh(grid)
    assert len(verts) > 100 and len(faces) > 100
    # the wall is at z = -2 in the OpenGL convention
    assert np.abs(verts[:, 2] + 2.0).max() < 0.08, verts[:, 2]
    np.testing.assert_allclose(colors.mean(0), [0.2, 0.5, 0.8], atol=0.05)


def test_fuse_synthetic_room_geometry():
    cfg = small_cfg()
    ds = Synthetic(cfg)
    frames, poses = [], []
    for i in range(0, 6, 2):
        _, c, d, p = ds[i]
        frames.append((c, d))
        poses.append(p)
    grid = tsdf.fuse_frames(frames, poses, cfg["cam"]["fx"], cfg["cam"]["fy"],
                            cfg["cam"]["cx"], cfg["cam"]["cy"], voxel=0.06)
    verts, faces, colors = tsdf.extract_mesh(grid)
    assert len(verts) > 500
    lo, hi = ds.box_lo, ds.box_hi
    # all surface vertices near a wall face or an interior object
    near_face = np.zeros(len(verts), bool)
    for a in range(3):
        near_face |= np.abs(verts[:, a] - lo[a]) < 0.1
        near_face |= np.abs(verts[:, a] - hi[a]) < 0.1
    for row in Synthetic._BOXES:
        blo, bhi = row[:3], row[3:]
        inb = ((verts > blo - 0.1) & (verts < bhi + 0.1)).all(-1)
        near_face |= inb
    for row in Synthetic._SPHERES:
        r = np.linalg.norm(verts - row[:3], axis=-1)
        near_face |= np.abs(r - row[3]) < 0.1
    assert near_face.mean() > 0.98, near_face.mean()
    # mesh is watertight-ish in observed area: faces reference valid verts
    assert faces.max() < len(verts)


def test_weight_accumulation():
    H, W = 20, 20
    depth = np.full((H, W), 1.0, np.float32)
    color = np.zeros((H, W, 3), np.float32)
    c2w = np.eye(4, dtype=np.float32)
    grid = tsdf.grid_for_bounds([-1, -1, -2], [1, 1, 0], 0.1)
    g1 = tsdf.integrate(grid, jnp.asarray(depth), jnp.asarray(color),
                        jnp.asarray(c2w), 20.0, 20.0, 9.5, 9.5)
    w1 = float(jnp.sum(g1.weight))
    g2 = tsdf.integrate(g1, jnp.asarray(depth), jnp.asarray(color),
                        jnp.asarray(c2w), 20.0, 20.0, 9.5, 9.5)
    assert float(jnp.sum(g2.weight)) > 1.9 * w1
