import numpy as np

from loopy_slam_tpu.ops import registration as reg


def make_surface(rng, n=4000):
    """Random smooth heightfield surface — realistic registration target."""
    x = rng.uniform(-1, 1, n)
    z = rng.uniform(-1, 1, n)
    y = (0.3 * np.sin(2.5 * x) + 0.2 * np.cos(3.1 * z)
         + 0.1 * np.sin(5 * x * z))
    return np.stack([x, y, z], -1)


def rigid(rng, rot_scale=0.3, t_scale=0.4):
    w = rng.normal(size=3) * rot_scale
    T = np.eye(4)
    T[:3, :3] = reg._rotvec_to_mat(w)
    T[:3, 3] = rng.normal(size=3) * t_scale
    return T


def test_voxel_down_sample(rng):
    pts = rng.uniform(-1, 1, (5000, 3))
    down, _ = reg.voxel_down_sample(pts, 0.2)
    assert len(down) < len(pts)
    # downsampled points stay inside their voxels
    assert np.linalg.norm(down, axis=1).max() < np.sqrt(3) + 0.2


def test_normals_flat_plane(rng):
    x = rng.uniform(-1, 1, (2000, 2))
    pts = np.concatenate([x, np.zeros((2000, 1))], -1)  # z=0 plane
    n = reg.estimate_normals(pts, radius=0.3, max_nn=30,
                             camera_location=np.array([0, 0, 5.0]))
    # all normals ~ +z (oriented toward camera)
    assert (n[:, 2] > 0.99).mean() > 0.99


def test_icp_recovers_transform(rng):
    src = make_surface(rng)
    T_gt = rigid(rng, rot_scale=0.05, t_scale=0.05)
    dst = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    dn = reg.estimate_normals(dst, 0.1, 50, camera_location=np.array([0, 5, 0.0]))
    T, fit, rmse = reg.icp_point_to_plane(src, dst, dn, 0.3, np.eye(4),
                                          max_iter=50)
    np.testing.assert_allclose(T, T_gt, atol=5e-3)
    assert fit > 0.9


def test_robust_icp_with_outliers(rng):
    src = make_surface(rng, 3000)
    T_gt = rigid(rng, rot_scale=0.03, t_scale=0.03)
    dst = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    # corrupt 20% of the source with large noise
    src_noisy = src.copy()
    bad = rng.choice(len(src), len(src) // 5, replace=False)
    src_noisy[bad] += rng.normal(size=(len(bad), 3)) * 0.5
    dn = reg.estimate_normals(dst, 0.1, 50, camera_location=np.array([0, 5, 0.0]))
    T, fit, rmse = reg.icp_point_to_plane(src_noisy, dst, dn, 0.05, np.eye(4),
                                          max_iter=50, tukey_k=0.01)
    np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=0.01)


def test_full_robust_pipeline_large_offset(rng):
    """RANSAC must provide the basin; ICP then refines — large transform."""
    src = make_surface(rng, 5000)
    T_gt = rigid(rng, rot_scale=0.4, t_scale=0.5)
    dst = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    out = reg.register_point_cloud_pair(
        0, 2, {"points": src, "points_color": np.zeros_like(src),
               "keyframe": np.eye(4)},
        {"points": dst, "points_color": np.zeros_like(dst),
         "keyframe": T_gt},
        method="robust_icp", global_iter=20000, conf=0.999,
        rng=np.random.default_rng(3))
    assert out["success"], out["fitness"]
    T = out["transformation"]
    err_t = np.abs(T[:3, 3] - T_gt[:3, 3]).max()
    err_R = np.abs(T[:3, :3] - T_gt[:3, :3]).max()
    assert err_t < 0.02, (err_t, T, T_gt)
    assert err_R < 0.02, err_R
    # info gate: full overlap -> info[5,5] ~ number of src points
    assert out["information"][5, 5] / out["n_points"] > 0.5


def test_register_pair_rejects_nonoverlapping(rng):
    src = make_surface(rng, 2000)
    dst = make_surface(np.random.default_rng(99), 2000) + np.array([10, 0, 0])
    out = reg.register_point_cloud_pair(
        0, 3, {"points": src, "points_color": np.zeros_like(src),
               "keyframe": np.eye(4)},
        {"points": dst, "points_color": np.zeros_like(dst),
         "keyframe": np.eye(4)},
        method="robust_icp", global_iter=5000, conf=0.99,
        rng=np.random.default_rng(4))
    assert not out["success"]
    np.testing.assert_array_equal(out["transformation"], np.eye(4))


def test_information_matrix_count():
    pts = np.random.default_rng(0).uniform(-1, 1, (500, 3))
    info = reg.information_matrix(pts, pts, 0.03, np.eye(4))
    assert info[5, 5] == 500  # exact self-correspondences
    perm = reg.info_o3d_to_rho_phi(info)
    assert perm[2, 2] == 500  # translation block moved to rho


def test_colored_icp_beats_plain_on_textured_plane(rng):
    """A flat textured plane: in-plane translation is geometrically
    unobservable (point-to-plane residuals vanish), but the color term
    recovers it (reference common.py:685-713 colored ICP)."""
    n = 6000
    xy = rng.uniform(-0.5, 0.5, (n, 2))
    pts = np.concatenate([xy, np.zeros((n, 1))], -1)
    # smooth intensity texture with in-plane gradient structure
    inten = 0.5 + 0.25 * np.sin(12.0 * pts[:, 0]) \
        + 0.25 * np.cos(9.0 * pts[:, 1])
    colors = np.repeat(inten[:, None], 3, axis=1)

    T_true = np.eye(4)
    T_true[:3, 3] = [0.02, -0.015, 0.0]  # pure in-plane shift
    src = pts @ T_true[:3, :3].T + T_true[:3, 3]

    cam = np.array([0.0, 0.0, 2.0])
    # plain point-to-plane: cannot observe the in-plane shift
    tn = reg.estimate_normals(pts, 0.08, 30, cam)
    T_plain, _, _ = reg.icp_point_to_plane(src, pts, tn, 0.1, np.eye(4),
                                           max_iter=30)
    # colored ICP
    T_col, fit, _ = reg.colored_icp_multiscale(src, colors, pts, colors,
                                               cam_s=cam, cam_t=cam)
    err_plain = np.linalg.norm(T_plain[:3, 3] + T_true[:3, 3])
    err_col = np.linalg.norm(T_col[:3, 3] + T_true[:3, 3])
    # T maps src back onto target, so the recovered translation is -T_true
    assert err_col < 0.004, err_col
    assert err_col < 0.3 * max(err_plain, 1e-9), (err_col, err_plain)
    assert fit > 0.9


def test_colored_icp_method_in_pairwise(rng):
    """pairwise_registration(method='colored_icp') runs the multi-scale
    path end-to-end on submap dicts and recovers a small rigid offset."""
    pts = make_surface(rng, 5000)
    inten = 0.5 + 0.3 * np.sin(7 * pts[:, 0]) * np.cos(5 * pts[:, 2])
    colors = np.repeat(inten[:, None], 3, axis=1)
    T_true = np.eye(4)
    T_true[:3, :3] = reg._rotvec_to_mat(np.array([0.0, 0.02, 0.0]))
    T_true[:3, 3] = [0.015, -0.01, 0.02]
    src_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
    kf = np.eye(4)
    kf[:3, 3] = [0, 2.0, 0]
    out = reg.pairwise_registration(
        {"points": src_pts, "points_color": colors, "keyframe": kf},
        {"points": pts, "points_color": colors, "keyframe": kf},
        method="colored_icp")
    T_rec = out["transformation"]
    # recovered transform should invert T_true
    err = np.abs(T_rec @ T_true - np.eye(4)).max()
    assert err < 5e-3, err


def test_robust_icp_small_drift_on_aliased_floor(rng):
    """Wrong-basin protection: a floor-dominated scene with a periodic row
    of identical bumps aliases under global registration (sliding one
    period along the floor keeps high overlap fitness). Submaps are
    world-aligned by tracking, so the true transform is centimeters;
    robust_icp must recover it exactly — the identity-seeded hypothesis,
    not RANSAC, must win (the room0 2000-frame run diverged to 0.66 m ATE
    when RANSAC floor-sliding edges entered the pose graph)."""
    n_floor = 6000
    floor = np.stack([rng.uniform(-2, 2, n_floor),
                      np.zeros(n_floor),
                      rng.uniform(-2, 2, n_floor)], -1)
    bumps = []
    for cx in np.arange(-1.75, 2.0, 0.5):   # identical bumps, period 0.5
        t = rng.uniform(-0.08, 0.08, (300, 2))
        y = 0.15 - (t ** 2).sum(-1) * 6
        bumps.append(np.stack([cx + t[:, 0], y, t[:, 1]], -1))
    dst = np.concatenate([floor] + bumps, 0)
    T_gt = np.eye(4)
    T_gt[:3, :3] = reg._rotvec_to_mat(np.array([0.01, 0.02, -0.015]))
    T_gt[:3, 3] = [0.03, -0.01, 0.02]       # centimeter drift
    src = (dst - T_gt[:3, 3]) @ T_gt[:3, :3]   # T_gt maps src -> dst
    out = reg.register_point_cloud_pair(
        0, 4, {"points": src, "points_color": np.zeros_like(src),
               "keyframe": np.eye(4)},
        {"points": dst, "points_color": np.zeros_like(dst),
         "keyframe": np.eye(4)},
        method="robust_icp", global_iter=20000, conf=0.999,
        rng=np.random.default_rng(7))
    assert out["success"]
    err_t = np.abs(out["transformation"][:3, 3] - T_gt[:3, 3]).max()
    assert err_t < 0.005, (err_t, out["transformation"][:3, 3], T_gt[:3, 3])
