import numpy as np
import jax.numpy as jnp

from loopy_slam_tpu.ops.raster import render_depth_points, sample_mesh_surface
from loopy_slam_tpu.tools.eval_recon import calc_3d_metric
from loopy_slam_tpu.tools.cull_mesh import cull_mesh
from loopy_slam_tpu.utils.metrics import (depth_l1, masked_psnr, ms_ssim,
                                          ssim)


def test_psnr_basics(rng):
    img = rng.uniform(size=(64, 64, 3))
    assert masked_psnr(img, img) == float("inf")
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    p = masked_psnr(noisy, img)
    assert 15 < p < 25
    # mask restricts the comparison
    half = np.zeros((64, 64), bool)
    half[:32] = True
    img2 = img.copy()
    img2[32:] = 0  # corrupt only unmasked half
    assert masked_psnr(img2, img, half) == float("inf")


def test_ssim_ordering(rng):
    img = rng.uniform(size=(96, 96, 3))
    near = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    far = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    assert ssim(img, img) > 0.999
    assert ssim(near, img) > ssim(far, img)
    assert ms_ssim(img, img) > 0.999
    assert ms_ssim(near, img) > ms_ssim(far, img)


def test_depth_l1_masks_invalid():
    d = np.ones((10, 10))
    ref = np.ones((10, 10)) * 1.5
    ref[5:] = 0  # invalid
    assert abs(depth_l1(d, ref) - 0.5) < 1e-9


def _unit_square_mesh(z=0.0, n=10):
    xs = np.linspace(-1, 1, n)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([uu.ravel(), vv.ravel(), np.full(n * n, z)], -1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts, np.array(faces)


def test_calc_3d_metric_identical_and_offset():
    gt = _unit_square_mesh(0.0)
    same = calc_3d_metric(gt, gt, n_samples=20000, align=False)
    # nonzero floor = sampling density (20k samples over 4 m^2, ~7 mm nn)
    assert same["accuracy"] < 1.0 and same["completion"] < 1.0  # cm
    assert same["fscore"] > 70
    off = _unit_square_mesh(0.03)  # 3 cm away
    m = calc_3d_metric(off, gt, n_samples=20000, align=False)
    # 3 cm plane offset + finite sampling density
    assert 2.0 < m["accuracy"] < 5.0, m
    assert m["fscore"] < 50


def test_render_depth_points_flat_wall(rng):
    verts, faces = _unit_square_mesh(-2.0, n=20)
    pts, _ = sample_mesh_surface(verts, faces, 200000, rng)
    c2w = jnp.eye(4)
    d = np.asarray(render_depth_points(jnp.asarray(pts, jnp.float32), c2w,
                                       60, 80, 60.0, 60.0, 39.5, 29.5))
    center = d[20:40, 30:50]
    assert (center > 0).mean() > 0.95
    np.testing.assert_allclose(center[center > 0], 2.0, atol=0.02)


def test_cull_mesh_removes_unseen():
    verts, faces = _unit_square_mesh(-2.0, n=10)
    # second square far behind the camera (unseen)
    v2, f2 = _unit_square_mesh(+5.0, n=10)
    allv = np.concatenate([verts, v2])
    allf = np.concatenate([faces, f2 + len(verts)])
    cam = {"H": 60, "W": 80, "fx": 60.0, "fy": 60.0, "cx": 39.5, "cy": 29.5}
    v, f, _ = cull_mesh(allv, allf, [np.eye(4)], cam)
    assert len(f) == len(faces)
    assert (v[:, 2] < 0).all()
    # return_unseen includes every vertex of the hidden square (plus any
    # front-square vertices falling just outside the frustum edge)
    v, f, _, unseen = cull_mesh(allv, allf, [np.eye(4)], cam,
                                return_unseen=True)
    assert (unseen[:, 2] > 0).sum() == len(v2)


def _cube_room_mesh(half=2.0, n=6):
    """Closed axis-aligned cube room (triangulated, watertight)."""
    grids = []
    faces = []
    verts = []

    def add_face(axis, sign):
        base = len(verts)
        xs = np.linspace(-half, half, n)
        a, b = np.meshgrid(xs, xs, indexing="ij")
        flat = np.full(n * n, sign * half)
        cols = [None, None, None]
        cols[axis] = flat
        others = [i for i in range(3) if i != axis]
        cols[others[0]] = a.ravel()
        cols[others[1]] = b.ravel()
        verts.extend(np.stack(cols, -1))
        for i in range(n - 1):
            for j in range(n - 1):
                q = base + i * n + j
                faces.append([q, q + 1, q + n])
                faces.append([q + 1, q + n + 1, q + n])

    for axis in range(3):
        for sign in (-1, 1):
            add_face(axis, sign)
    return np.asarray(verts, np.float64), np.asarray(faces)


def test_raster_mesh_depth_matches_analytic():
    from loopy_slam_tpu.native.build import raster_mesh_depth
    verts, faces = _unit_square_mesh(-2.0, n=5)
    d = raster_mesh_depth(verts, faces, np.eye(4), 60, 80,
                          60.0, 60.0, 39.5, 29.5)
    if d is None:  # toolchain unavailable
        return
    center = d[20:40, 30:50]
    assert (center > 0).all()
    np.testing.assert_allclose(center, 2.0, atol=1e-4)


def test_calc_2d_metric_room():
    from loopy_slam_tpu.tools.eval_recon import calc_2d_metric
    gt = _cube_room_mesh(2.0)
    # identical meshes -> ~0 depth L1
    same = calc_2d_metric(gt, gt, n_views=6, align=False)
    assert same["depth l1"] < 0.2, same  # cm
    # reconstruction uniformly shrunk by 10 cm -> clearly nonzero
    rec = (gt[0] * 0.95, gt[1])
    off = calc_2d_metric(rec, gt, n_views=6, align=False)
    assert off["depth l1"] > 1.0, off


def test_calc_2d_metric_unseen_rejection():
    """Views are resampled until no unseen-region point projects into
    the frustum (reference eval_recon.py:166-185)."""
    from loopy_slam_tpu.tools.eval_recon import check_proj, viewmatrix
    c2w = viewmatrix(np.array([1.0, 0, 0]), np.array([0.0, 0, -1.0]),
                     np.zeros(3))
    ahead = np.array([[2.0, 0.0, 0.0]])
    behind = np.array([[-2.0, 0.0, 0.0]])
    assert check_proj(ahead, 500, 500, 300, 300, 249.5, 249.5, c2w)
    assert not check_proj(behind, 500, 500, 300, 300, 249.5, 249.5, c2w)
