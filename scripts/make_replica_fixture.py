#!/usr/bin/env python
"""Render the procedural Synthetic scene to disk in Replica's exact on-disk
format (results/frame%06d.jpg + results/depth%06d.png + traj.txt), at
Replica's full camera geometry (680x1200, fx=fy=600).

Purpose: the sandbox has zero network egress, so the real Replica release
(scripts/download_replica.sh) cannot be staged. This fixture exercises the
*entire* real-data path at full scale instead: the actual Replica loader
(glob, jpg decode, uint16 png depth, traj.txt parse, Y/Z flip —
loopy_slam_tpu/utils/datasets.py:85-98, parity with reference
src/utils/datasets.py:124-148), full-resolution intrinsics, JPEG/uint16
quantization noise, and 2000-frame compile/keyframe-ring scaling.

Usage:
    python scripts/make_replica_fixture.py --out data/Replica/room0 \
        --frames 2000

The written trajectory stores flip_yz(c2w) so that the loader's flip
recovers the true pose (the flip is an involution).

Resumable: existing frames are skipped, traj.txt is rewritten at the end.
"""

import argparse
import copy
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from loopy_slam_tpu.config import DEFAULTS, update_recursive  # noqa: E402
from loopy_slam_tpu.utils.datasets import Synthetic  # noqa: E402

REPLICA_CAM = {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
               "cx": 599.5, "cy": 339.5, "png_depth_scale": 6553.5,
               "crop_edge": 0}


def make_dataset(n_frames: int, motion_speed: float,
                 scene: str = "v2") -> Synthetic:
    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {
        "dataset": "synthetic",
        "cam": dict(REPLICA_CAM),
        "data": {"n_frames": n_frames, "motion_speed": motion_speed,
                 "scene": scene},
    })
    return Synthetic(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/Replica/room0")
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--motion-speed", type=float, default=1.0 / 1000,
                    help="orbit parameter step per frame; 1/1000 gives two "
                         "full orbits (guaranteed revisits) over 2000 frames")
    ap.add_argument("--jpeg-quality", type=int, default=92)
    ap.add_argument("--scene", default="v2", choices=["v2", "v3"],
                    help="procedural scene version (datasets.py Synthetic)")
    args = ap.parse_args()

    ds = make_dataset(args.frames, args.motion_speed, args.scene)
    res = os.path.join(args.out, "results")
    os.makedirs(res, exist_ok=True)

    scale = REPLICA_CAM["png_depth_scale"]
    traj = []
    import time
    t0 = time.perf_counter()
    for i in range(args.frames):
        c2w = ds.poses[i]
        traj.append(c2w)
        fj = os.path.join(res, f"frame{i:06d}.jpg")
        fd = os.path.join(res, f"depth{i:06d}.png")
        if os.path.exists(fj) and os.path.exists(fd):
            continue
        color, depth = ds.render_frame(c2w)
        bgr = cv2.cvtColor((color * 255.0).round().astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(fj, bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, args.jpeg_quality])
        d16 = np.clip(depth * scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(fd, d16)
        if i % 100 == 0:
            dt = time.perf_counter() - t0
            print(f"frame {i}/{args.frames} ({dt:.0f}s)", flush=True)

    # store the flipped matrix: Replica loader applies _flip_yz on read
    with open(os.path.join(args.out, "traj.txt"), "w") as f:
        for c2w in traj:
            m = c2w.copy()
            m[:3, 1] *= -1
            m[:3, 2] *= -1
            f.write(" ".join(f"{v:.9g}" for v in m.reshape(-1)) + "\n")
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
