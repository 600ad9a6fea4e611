import numpy as np

from loopy_slam_tpu.mapping.fragments import (Fragment, FragmentManager,
                                              cos_rel_rot, rel_trans)
from loopy_slam_tpu.mapping.loop_closure import LoopCloser, LoopClosureConfig
from loopy_slam_tpu.mapping import place_recognition as pr


def make_fm():
    return FragmentManager(0.3, 0.94, 60, 80, 60.0, 60.0, 39.5, 29.5)


def test_segment_trigger_thresholds():
    fm = make_fm()
    a = np.eye(4)
    assert fm.should_start_new(a)  # no fragments yet
    fm.start_fragment(0, a, a, np.zeros((60, 80, 3)), np.zeros((60, 80)),
                      None)
    near = a.copy()
    near[:3, 3] = [0.1, 0, 0]
    assert not fm.should_start_new(near)
    far = a.copy()
    far[:3, 3] = [0.4, 0, 0]
    assert fm.should_start_new(far)
    rot = a.copy()
    th = 0.45  # ~26 deg > acos(0.94)~20 deg
    rot[:3, :3] = [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]]
    assert fm.should_start_new(rot)
    assert abs(rel_trans(a, far) - 0.4) < 1e-6
    assert cos_rel_rot(a, rot) < 0.94


def test_merged_global_averages_duplicates():
    fm = make_fm()
    eye = np.eye(4)
    img = np.zeros((60, 80, 3))
    dep = np.zeros((60, 80))
    # fragment 0: 4 points; points 2,3 carried into fragment 1
    fm.start_fragment(0, eye, eye, img, dep, None, idx_start_features=0)
    p0 = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], float)
    g0 = np.arange(4, dtype=float)[:, None] * np.ones((1, 2))
    carry0 = np.array([False, False, True, True])
    fm.close_active(p0, g0, g0.copy(), p0, p0, carry0)
    # fragment 1 (active): leading block = carried copies (possibly drifted),
    # plus one new point
    fm.start_fragment(5, eye, eye, img, dep, None, idx_start_features=2)
    p1 = np.array([[2.2, 0, 0], [3.2, 0, 0], [9, 0, 0]], float)
    g1 = np.array([[10.0, 10], [20, 20], [5, 5]])
    P, G, C = fm.merged_global(p1, g1, g1.copy())
    # output: fragment-0 points {0,1} + fragment-1 {avg(2,2.2), avg(3,3.2), 9}
    assert len(P) == 5
    np.testing.assert_allclose(sorted(P[:, 0]), [0, 1, 2.1, 3.1, 9])
    # features averaged for duplicates: (2+10)/2=6, (3+20)/2=11.5
    got = sorted(G[:, 0])
    np.testing.assert_allclose(got, [0, 1, 5, 6, 11.5])


def test_orb_scoredb_roundtrip(rng):
    # two distinct procedural textures; similar frames must outscore others
    def tex(seed):
        r = np.random.default_rng(seed)
        base = r.uniform(0, 1, (16, 16, 3))
        import cv2
        return cv2.resize(base, (320, 240), interpolation=cv2.INTER_LINEAR)

    a = tex(1)
    a2 = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1)  # same place, noise
    b = tex(2)
    da, da2, db = (pr.extract_orb(x) for x in (a, a2, b))
    assert da is not None and db is not None
    assert pr.match_score(da, da2) > pr.match_score(da, db) + 0.1

    db_ = pr.ScoreDB()
    db_.add(da)
    db_.add(db)
    res = db_.query(da2, 2)
    assert res[0].Id == 0 and res[0].Score > res[1].Score


def _box_cloud(rng, n=3000):
    # room-like cloud: points on 3 walls
    w = rng.integers(0, 3, n)
    u = rng.uniform(-1, 1, n)
    v = rng.uniform(-1, 1, n)
    pts = np.zeros((n, 3))
    pts[w == 0] = np.stack([u[w == 0], v[w == 0], -np.ones((w == 0).sum())], -1)
    pts[w == 1] = np.stack([np.ones((w == 1).sum()), u[w == 1], v[w == 1]], -1)
    pts[w == 2] = np.stack([u[w == 2], np.ones((w == 2).sum()), v[w == 2]], -1)
    # add smooth bumps so registration locks rotation
    pts += 0.05 * np.sin(3 * pts[:, [1, 2, 0]])
    return pts


def test_loop_closure_corrects_synthetic_drift(rng):
    """5 fragments of one static scene; segment 3 drifts; a loop edge back
    to segment 0 should pull it back."""
    fm = make_fm()
    cfg = LoopClosureConfig(n_jobs=1, global_iter=20000, conf=0.999,
                            orb_filter=False, min_dist=1, kval=3,
                            std_threshold=1.0)  # std gate open: accept all
    lc = LoopCloser(cfg, fm)
    cloud = _box_cloud(rng)
    eye = np.eye(4)
    img = np.zeros((60, 80, 3))
    dep = np.zeros((60, 80))

    drift = np.eye(4)
    drift[:3, 3] = [0.12, -0.08, 0.1]
    n_frag = 5
    for i in range(n_frag):
        anchor = np.eye(4)
        anchor[:3, 3] = [0.05 * i, 0, 0]
        fm.start_fragment(i * 10, anchor, anchor, img, dep, None)
        lc.dbow_scores.append(-1.0)
        f = fm.fragments[-1]
        f.npc = cloud.copy()
        f.geo = np.zeros((len(cloud), 2))
        f.col = np.zeros((len(cloud), 2))
        f.carry_mask = np.zeros(len(cloud), bool)
        # fragments see the SAME scene; drifted ones see it displaced
        T = drift if i >= 3 else np.eye(4)
        f.reg_points = cloud @ T[:3, :3].T + T[:3, 3]
        f.reg_colors = np.zeros_like(cloud)
        f.sensor_pts = f.reg_points
        f.sensor_rgb = np.zeros_like(cloud)

    # place recognition stub: every anchor matches fragment 0
    class FakeDB:
        def query(self, des, k):
            return [pr.QueryResult(0, 1.0), pr.QueryResult(3, 0.9)]
    lc.db = FakeDB()

    corrections = lc.compute_correction()
    assert corrections is not None
    # fragment 3 (drifted) must be moved back by ~drift^-1
    N3 = corrections[3]
    np.testing.assert_allclose(N3[:3, 3], -drift[:3, 3], atol=0.03)
    # fragment 0 stays fixed (gauge)
    np.testing.assert_allclose(corrections[0], np.eye(4), atol=1e-4)
