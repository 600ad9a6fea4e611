#!/usr/bin/env python
"""Render the procedural Synthetic scene to disk in TUM-RGBD and ScanNet
on-disk formats, exercising every real-sensor code path the Replica fixture
cannot: radial distortion + undistortion, timestamp association with
dropped/jittered frames, zero-depth sensor holes (the sample_near_pcl ray
path), per-frame exposure modulation, non-depth-resolution color streams,
and invalid (inf) ground-truth poses.

Zero network egress blocks the real downloads (scripts/download_*.sh); the
fixtures run the ACTUAL loaders (loopy_slam_tpu/utils/datasets.py TUM_RGBD
:149-204 and ScanNet :111-120; reference parity src/utils/datasets.py
:190-333) on data that is format-identical to the real releases.

TUM (rgbd_dataset-style folder):
  rgb/<t>.png color, distorted with freiburg1's published coefficients —
    the loader's cv2.undistort must recover pinhole geometry;
  depth/<t>.png uint16 @5000, pinhole (the loader does NOT undistort
    depth, matching the reference), with elliptical dropout holes;
  rgb.txt / depth.txt / groundtruth.txt with 30 Hz jittered timestamps,
    ~5% of depth frames dropped (association skips those images), poses at
    100 Hz in tx ty tz qx qy qz qw.

ScanNet (scene-style folder):
  frames/color/<i>.jpg at 1296x968 (the loader resizes color to the depth
    resolution), with per-frame exposure gain/tint (the encode_exposure
    path must absorb it);
  frames/depth/<i>.png uint16 @1000 at 640x480;
  frames/pose/<i>.txt raw 4x4 c2w, a few of them inf (invalid-GT masking).

Both store flip_yz(c2w) so the loaders' Y/Z flip recovers the true pose.

Usage:
    python scripts/make_sensor_fixtures.py --format tum \
        --out data/TUM_RGBD/rgbd_dataset_freiburg1_desk --frames 120
    python scripts/make_sensor_fixtures.py --format scannet \
        --out data/ScanNet/scans/scene0000_00 --frames 400
"""

import argparse
import copy
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from loopy_slam_tpu.config import DEFAULTS, update_recursive  # noqa: E402
from loopy_slam_tpu.utils.datasets import Synthetic, _flip_yz  # noqa: E402

TUM_CAM = {"H": 480, "W": 640, "fx": 517.3, "fy": 516.5,
           "cx": 318.6, "cy": 255.3, "png_depth_scale": 5000.0,
           "crop_edge": 0}
TUM_DIST = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])

SCANNET_DEPTH_CAM = {"H": 480, "W": 640, "fx": 577.6, "fy": 578.7,
                     "cx": 319.5, "cy": 239.5, "png_depth_scale": 1000.0,
                     "crop_edge": 0}
SCANNET_COLOR_HW = (968, 1296)


def scale_cam(cam, scale: int):
    """Divide the camera geometry by an integer factor (distortion
    coefficients act on normalized coordinates, so they are resolution-
    independent and carry over unchanged)."""
    if scale == 1:
        return dict(cam)
    out = dict(cam)
    out["H"] = cam["H"] // scale
    out["W"] = cam["W"] // scale
    for k in ("fx", "fy"):
        out[k] = cam[k] / scale
    out["cx"] = (cam["cx"] + 0.5) / scale - 0.5
    out["cy"] = (cam["cy"] + 0.5) / scale - 0.5
    return out


def make_dataset(cam, n_frames, motion_speed):
    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {
        "dataset": "synthetic",
        "cam": dict(cam),
        "data": {"n_frames": n_frames, "motion_speed": motion_speed},
    })
    return Synthetic(cfg)


def distort_image(img, K, dist):
    """Produce the DISTORTED image whose cv2.undistort(...) recovers the
    pinhole render: sample the clean image at the undistorted location of
    every distorted pixel (cv2.undistortPoints inverts the model)."""
    H, W = img.shape[:2]
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    pts = np.stack([u.reshape(-1), v.reshape(-1)], -1)[:, None, :]
    norm = cv2.undistortPoints(pts, K, dist).reshape(H, W, 2)
    map_x = (norm[..., 0] * K[0, 0] + K[0, 2]).astype(np.float32)
    map_y = (norm[..., 1] * K[1, 1] + K[1, 2]).astype(np.float32)
    return cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REPLICATE)


def punch_holes(depth, rng, n_holes=6, frac=0.02):
    """Elliptical zero-depth dropouts (~frac of pixels), like specular/IR
    failures on a real sensor — feeds the sample_near_pcl ray path."""
    H, W = depth.shape
    mask = np.zeros((H, W), np.uint8)
    area = int(frac * H * W / max(n_holes, 1))
    for _ in range(n_holes):
        cx, cy = rng.integers(0, W), rng.integers(0, H)
        a = max(2, int(np.sqrt(area) * rng.uniform(0.5, 1.5)))
        b = max(2, area // max(a, 1))
        cv2.ellipse(mask, (int(cx), int(cy)), (a, b),
                    float(rng.uniform(0, 180)), 0, 360, 1, -1)
    out = depth.copy()
    out[mask > 0] = 0.0
    return out


def write_tum(out, frames, motion_speed, seed=7, scale=1):
    cam = scale_cam(TUM_CAM, scale)
    ds = make_dataset(cam, frames, motion_speed)
    rng = np.random.default_rng(seed)
    K = np.array([[cam["fx"], 0, cam["cx"]],
                  [0, cam["fy"], cam["cy"]], [0, 0, 1]])
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    t0 = 1305031100.0
    rgb_rows, depth_rows, gt_rows = [], [], []
    # poses at 100 Hz around the camera timestamps (association picks
    # nearest within 0.08 s)
    for i in range(frames):
        t = t0 + i / 30.0 + float(rng.uniform(-0.004, 0.004))
        c2w = ds.poses[i]
        color, depth = ds.render_frame(c2w)
        bgr = cv2.cvtColor((color * 255.0).round().astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        bgr_d = distort_image(bgr, K, TUM_DIST)
        rgb_name = f"rgb/{t:.6f}.png"
        cv2.imwrite(os.path.join(out, rgb_name), bgr_d)
        rgb_rows.append((t, rgb_name))

        if rng.uniform() > 0.05:  # ~5% depth drops
            td = t + float(rng.uniform(0.005, 0.02))
            depth_h = punch_holes(depth, rng)
            d16 = np.clip(depth_h * cam["png_depth_scale"],
                          0, 65535).astype(np.uint16)
            depth_name = f"depth/{td:.6f}.png"
            cv2.imwrite(os.path.join(out, depth_name), d16)
            depth_rows.append((td, depth_name))

        if i % 100 == 0:
            print(f"tum frame {i}/{frames}", flush=True)

    from scipy.spatial.transform import Rotation
    tp0 = t0 - 0.5
    n_pose = int((frames / 30.0 + 1.0) * 100)
    for j in range(n_pose):
        tp = tp0 + j / 100.0
        fi = min(max(int(round((tp - t0) * 30.0)), 0), frames - 1)
        m = _flip_yz(ds.poses[fi])  # store sensor-convention pose
        q = Rotation.from_matrix(m[:3, :3]).as_quat()  # x y z w
        tr = m[:3, 3]
        gt_rows.append((tp, *tr, *q))

    with open(os.path.join(out, "rgb.txt"), "w") as f:
        f.write("# color images\n# fixture\n# timestamp filename\n")
        f.writelines(f"{t:.6f} {n}\n" for t, n in rgb_rows)
    with open(os.path.join(out, "depth.txt"), "w") as f:
        f.write("# depth maps\n# fixture\n# timestamp filename\n")
        f.writelines(f"{t:.6f} {n}\n" for t, n in depth_rows)
    with open(os.path.join(out, "groundtruth.txt"), "w") as f:
        # first line is consumed by the loader's skiprows=1 (real TUM files
        # start with a comment there too)
        f.write("# ground truth trajectory\n# fixture\n"
                "# timestamp tx ty tz qx qy qz qw\n")
        # timestamps near 1.3e9 need fixed-point precision (%.9g would
        # collapse the sub-second part)
        f.writelines(f"{row[0]:.6f} "
                     + " ".join(f"{v:.9g}" for v in row[1:]) + "\n"
                     for row in gt_rows)
    print(f"wrote TUM fixture: {len(rgb_rows)} rgb / {len(depth_rows)} "
          f"depth frames to {out}")


def write_scannet(out, frames, motion_speed, seed=11, scale=1):
    dcam = scale_cam(SCANNET_DEPTH_CAM, scale)
    depth_ds = make_dataset(dcam, frames, motion_speed)
    ch, cw = SCANNET_COLOR_HW[0] // scale, SCANNET_COLOR_HW[1] // scale
    scale_x = cw / dcam["W"]
    scale_y = ch / dcam["H"]
    color_cam = dict(dcam)
    color_cam.update({
        "H": ch, "W": cw,
        "fx": dcam["fx"] * scale_x,
        "fy": dcam["fy"] * scale_y,
        "cx": dcam["cx"] * scale_x,
        "cy": dcam["cy"] * scale_y,
    })
    color_ds = make_dataset(color_cam, frames, motion_speed)
    rng = np.random.default_rng(seed)
    base = os.path.join(out, "frames")
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    bad_poses = set(int(i) for i in
                    rng.choice(frames, size=max(frames // 200, 1),
                               replace=False) if i > 1)
    for i in range(frames):
        c2w = depth_ds.poses[i]
        color, _ = color_ds.render_frame(c2w)
        _, depth = depth_ds.render_frame(c2w)
        # per-frame exposure: smooth gain sweep + slight channel tint (the
        # encode_exposure affine must absorb this)
        gain = 1.0 + 0.25 * np.sin(2 * np.pi * i / 120.0)
        tint = 1.0 + 0.06 * np.sin(2 * np.pi * i / 90.0 +
                                   np.array([0.0, 2.1, 4.2]))
        exposed = np.clip(color * gain * tint, 0.0, 1.0)
        bgr = cv2.cvtColor((exposed * 255.0).round().astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(base, "color", f"{i}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        depth_h = punch_holes(depth, rng, n_holes=3, frac=0.005)
        d16 = np.clip(depth_h * dcam["png_depth_scale"],
                      0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(base, "depth", f"{i}.png"), d16)
        if i in bad_poses:  # real ScanNet scans contain inf poses
            m = np.full((4, 4), np.inf)
        else:
            m = _flip_yz(c2w)
        np.savetxt(os.path.join(base, "pose", f"{i}.txt"), m)
        if i % 100 == 0:
            print(f"scannet frame {i}/{frames}", flush=True)
    print(f"wrote ScanNet fixture: {frames} frames to {out} "
          f"({len(bad_poses)} invalid poses)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", choices=("tum", "scannet"), required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--motion-speed", type=float, default=None,
                    help="orbit step/frame; default gives one revisit "
                         "orbit per ~200 frames")
    ap.add_argument("--scale", type=int, default=1,
                    help="integer camera downscale (tiny CPU test fixtures)")
    args = ap.parse_args()
    speed = args.motion_speed or 1.0 / 200.0
    if args.format == "tum":
        write_tum(args.out, args.frames, speed, scale=args.scale)
    else:
        write_scannet(args.out, args.frames, speed, scale=args.scale)


if __name__ == "__main__":
    main()
