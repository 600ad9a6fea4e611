#!/usr/bin/env python
"""Place-recognition quality + scaling benchmark (VERDICT r1 item #5).

Protocol: render anchor frames along a multi-orbit synthetic trajectory
(data.motion_speed = 1/n gives a full orbit — a guaranteed revisit — every
n frames), extract ORB per anchor, and replay the loop-closure flow: each
anchor queries the database of all earlier anchors (excluding the
`gap` most recent, like LoopCloser's adjacent-segment exclusion).

Ground truth: anchor pair (i, j) is a revisit iff camera centers are
within POS_T and viewing directions within ANG_T — the geometric overlap
the registration stage needs to succeed.

Reported, for brute-force mutual matching (the round-1 scorer) vs the
multi-index-hashing shortlist (native HamIndex + exact verify):
  - proposal precision / recall at the LC acceptance rule (top-k above
    min absolute score),
  - mean query time vs database size (the scaling claim).

Usage: python scripts/bench_place_recognition.py [--orbits 4] [--anchors 40]
"""

import argparse
import copy
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loopy_slam_tpu.config import DEFAULTS  # noqa: E402
from loopy_slam_tpu.mapping import place_recognition as pr  # noqa: E402
from loopy_slam_tpu.utils.datasets import Synthetic  # noqa: E402

POS_T = 0.25      # m between camera centers
ANG_T = 20.0      # deg between optical axes
MIN_SCORE = 0.12  # LC proposal acceptance floor (loop_closure defaults)
TOP_K = 3


def make_anchors(n_orbits: int, per_orbit: int, H=340, W=600):
    cfg = copy.deepcopy(DEFAULTS)
    cfg["cam"].update({"H": H, "W": W, "fx": 300.0, "fy": 300.0,
                       "cx": W / 2 - 0.5, "cy": H / 2 - 0.5})
    n_frames = n_orbits * per_orbit
    cfg["data"].update({"n_frames": n_frames,
                        "motion_speed": 1.0 / per_orbit})
    ds = Synthetic(cfg)
    poses, descs = [], []
    for i in range(n_frames):
        _, color, _, c2w = ds[i]
        ds._cache.clear()
        poses.append(np.asarray(c2w))
        descs.append(pr.extract_orb(color))
    return poses, descs


def is_revisit(pa, pb):
    dp = np.linalg.norm(pa[:3, 3] - pb[:3, 3])
    # camera looks along -z in the repo convention
    da, db = -pa[:3, 2], -pb[:3, 2]
    ang = np.degrees(np.arccos(np.clip(np.dot(da, db), -1, 1)))
    return dp < POS_T and ang < ANG_T


def replay(db, poses, descs, gap=3):
    """LC replay; returns (tp, fp, fn, query_times)."""
    tp = fp = fn = 0
    times = []
    for i in range(len(descs)):
        n_q = max(0, i - gap)
        if n_q > 0:
            # query sees anchors [0, n_q)
            t0 = time.perf_counter()
            res = db.query(descs[i], TOP_K)
            times.append((time.perf_counter() - t0, n_q))
            proposed = {r.Id for r in res
                        if r.Score > MIN_SCORE and r.Id < n_q}
            gt = {j for j in range(n_q) if is_revisit(poses[i], poses[j])}
            tp += len(proposed & gt)
            fp += len(proposed - gt)
            # recall is per-event: the LC needs ONE good proposal per
            # revisit event, not every overlapping anchor
            if gt and not (proposed & gt):
                fn += 1
            elif gt:
                fn += 0
        # LoopCloser adds the anchor when the segment closes; emulate the
        # gap by adding anchor i-gap now
        if i - gap >= 0 and i - gap < len(descs):
            pass
        db.add(descs[i])
    return tp, fp, fn, times


def run(db_kind: str, poses, descs):
    db = pr.ScoreDB(use_index=(db_kind == "indexed"))
    if db_kind == "indexed" and db._index is None:
        print("native index unavailable; skipping indexed run")
        return None
    tp, fp, fn, times = replay(db, poses, descs)
    n_events = tp + fn if (tp + fn) else 1
    prec = tp / max(tp + fp, 1)
    # event recall: of queries that HAD a revisit available, how many
    # produced at least one true proposal
    t_arr = np.array([t for t, _ in times])
    sizes = np.array([s for _, s in times])
    big = t_arr[sizes > sizes.max() * 0.7].mean() if len(t_arr) else 0.0
    small = t_arr[(sizes > 0) & (sizes < sizes.max() * 0.3)].mean() \
        if len(t_arr) else 0.0
    print(f"{db_kind:11s}: tp={tp} fp={fp} missed_events={fn} "
          f"precision={prec:.3f} "
          f"query mean {t_arr.mean()*1e3:.1f} ms "
          f"(small-db {small*1e3:.1f} ms -> large-db {big*1e3:.1f} ms)")
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec,
            "t_mean": float(t_arr.mean()), "t_small": float(small),
            "t_big": float(big)}


def scaling_probe(n_anchors=1000, n_desc=400, seed=0):
    """Pure-descriptor scaling: query cost vs DB size, synthetic ORB-like
    descriptors (random 256-bit; worst case for the index — no structure)."""
    rng = np.random.default_rng(seed)
    des = [rng.integers(0, 256, (n_desc, 32), np.uint8)
           for _ in range(n_anchors)]
    q = des[0].copy()
    for kind in ("brute", "indexed"):
        db = pr.ScoreDB(use_index=(kind == "indexed"))
        if kind == "indexed" and db._index is None:
            continue
        marks = {}
        for i, d in enumerate(des):
            db.add(d)
            if i + 1 in (125, 250, 500, 1000):
                t0 = time.perf_counter()
                db.query(q, TOP_K)
                marks[i + 1] = time.perf_counter() - t0
        print(f"scaling {kind:8s}: " + "  ".join(
            f"{n}a:{t*1e3:7.1f}ms" for n, t in marks.items()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orbits", type=int, default=4)
    ap.add_argument("--anchors", type=int, default=40,
                    help="anchors per orbit")
    ap.add_argument("--skip-scaling", action="store_true")
    args = ap.parse_args()

    print(f"rendering {args.orbits}x{args.anchors} anchor frames ...",
          flush=True)
    poses, descs = make_anchors(args.orbits, args.anchors)
    n_rev = sum(is_revisit(poses[i], poses[j])
                for i in range(len(poses)) for j in range(i - 3))
    print(f"{len(descs)} anchors, {n_rev} GT revisit pairs")
    r_brute = run("brute", poses, descs)
    r_idx = run("indexed", poses, descs)
    if r_brute and r_idx:
        ok = (r_idx["tp"] >= r_brute["tp"] * 0.95
              and r_idx["fp"] <= max(r_brute["fp"] * 1.05, r_brute["fp"] + 2))
        print("quality parity:", "PASS" if ok else "FAIL")
    if not args.skip_scaling:
        scaling_probe()


if __name__ == "__main__":
    main()
