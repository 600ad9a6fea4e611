"""Standalone freiburg-format trajectory evaluation (reference
src/tools/eval_ate.py:12-44 associate + :235-266 file mode): external
timestamped trajectory files must be associable and scoreable without a
checkpoint."""

import numpy as np

from loopy_slam_tpu.tools.eval_ate import (associate, evaluate_tum_files,
                                           read_tum_trajectory)


def _write_traj(path, stamps, offsets, jitter=0.0, rot_w=1.0):
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for s, o in zip(stamps, offsets):
            t = np.array([np.sin(s), np.cos(s), 0.1 * s]) + o
            if jitter:
                t = t + rng.normal(0, jitter, 3)
            f.write(f"{s:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"0 0 0 {rot_w}\n")


def test_associate_greedy_closest_unique():
    a = {0.00: 1, 0.10: 2, 0.20: 3}
    b = {0.004: 1, 0.11: 2, 0.50: 3}
    m = associate(a, b, max_difference=0.02)
    assert m == [(0.00, 0.004), (0.10, 0.11)]  # 0.20/0.50 unmatched
    # each stamp used once: two est stamps near one gt stamp -> best wins
    m2 = associate({0.0: 1, 0.005: 2}, {0.004: 1}, max_difference=0.02)
    assert m2 == [(0.005, 0.004)]


def test_evaluate_tum_files_roundtrip(tmp_path):
    stamps = np.arange(0, 3, 0.1)
    est_p, gt_p = str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")
    # identical trajectories, stamps jittered within the association
    # window, plus a rigid offset that Horn alignment removes
    _write_traj(est_p, stamps + 0.003, offsets=[np.array([1.0, 2.0, 0.0])]
                * len(stamps))
    _write_traj(gt_p, stamps, offsets=[np.zeros(3)] * len(stamps))
    stats = evaluate_tum_files(est_p, gt_p)
    assert stats["n"] == len(stamps)
    assert stats["rmse"] < 1e-6          # aligned: exact match
    assert stats["rmse_no_align"] > 1.0  # un-aligned keeps the offset

    tr = read_tum_trajectory(est_p)
    assert len(tr) == len(stamps) and all(len(v) == 7 for v in tr.values())
