#!/usr/bin/env python
"""Build a RANDOM-FEATURE LPIPS-alex weight bundle, severity-calibrated.

The reference reports LPIPS (torchmetrics, AlexNet calibration —
reference src/Mapper.py:1139-1140, src/tools/eval_images.py:23-49). The
official calibration (ImageNet-trained AlexNet convs + BAPPS-trained
linear heads) cannot be staged in this environment: zero network egress,
no torchvision/lpips cache anywhere in the image. This script produces the
closest honest substitute:

  * conv trunk: the exact AlexNet architecture (utils/lpips.py) with FIXED
    seeded He-normal random filters — random deep features are a known
    usable perceptual basis (random-weight VGG/AlexNet track human
    judgments far better than pixel metrics; cf. the LPIPS paper's
    random-network baseline);
  * linear heads: per-layer constants calibrated on synthetic distortion
    pairs rendered from the procedural scene so that (a) each layer
    contributes equally at mid severity, and (b) the overall scale anchors
    Gaussian-noise sigma=0.1 at distance 0.22 (the official alex metric
    scores that distortion ~0.2 on natural images).

The resulting metric is monotone in distortion severity (asserted by
tests/test_lpips.py::test_randfeat_bundle_monotone) and comparable ACROSS
RUNS OF THIS FRAMEWORK, but its absolute values are NOT comparable to
published LPIPS numbers — BASELINE.md documents this. Drop an official
bundle (scripts/convert_lpips_weights.py) at rendering.lpips_weights to
upgrade to the real metric; nothing else changes.

Usage: python scripts/make_lpips_randfeat.py \
            --out pretrained/lpips_alex_randfeat.npz
"""

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPECS = [  # (name, cout, cin, k)
    ("conv1", 64, 3, 11),
    ("conv2", 192, 64, 5),
    ("conv3", 384, 192, 3),
    ("conv4", 256, 384, 3),
    ("conv5", 256, 256, 3),
]

# official lpips input normalization constants (published in the lpips
# repo; plain numbers, not learned weights)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ANCHOR_SIGMA = 0.10
ANCHOR_DIST = 0.22


def random_trunk(seed=1219):
    rng = np.random.default_rng(seed)
    params = {"shift": SHIFT, "scale": SCALE}
    for name, cout, cin, k in SPECS:
        fan_in = cin * k * k
        params[f"{name}_w"] = (rng.normal(
            0.0, np.sqrt(2.0 / fan_in), (cout, cin, k, k))
            .astype(np.float32))
        params[f"{name}_b"] = np.zeros(cout, np.float32)
    for i, (_, cout, _, _) in enumerate(SPECS, 1):
        params[f"lin{i}_w"] = np.ones(cout, np.float32)  # pre-calibration
    return params


def base_images(n=8, hw=128):
    """Crops of the procedural scene (the same image statistics the SLAM
    eval renders have)."""
    from loopy_slam_tpu.config import DEFAULTS, update_recursive
    from loopy_slam_tpu.utils.datasets import Synthetic

    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {
        "dataset": "synthetic",
        "cam": {"H": hw, "W": hw, "fx": float(hw), "fy": float(hw),
                "cx": hw / 2 - 0.5, "cy": hw / 2 - 0.5,
                "png_depth_scale": 6553.5, "crop_edge": 0},
        "data": {"n_frames": n, "motion_speed": 0.035},
    })
    ds = Synthetic(cfg)
    return [ds[i][1] for i in range(n)]


def distort(img, kind, severity, rng):
    import cv2

    x = img.copy()
    if kind == "noise":
        return np.clip(x + rng.normal(0, severity, x.shape), 0, 1)
    if kind == "blur":
        k = int(severity * 4) * 2 + 1
        return cv2.GaussianBlur(x, (k, k), severity)
    if kind == "gain":
        return np.clip(x * (1.0 + severity), 0, 1)
    if kind == "jpeg":
        q = int(max(5, 95 - severity * 100))
        u8 = (x * 255).astype(np.uint8)
        _, enc = cv2.imencode(".jpg", u8[..., ::-1],
                              [cv2.IMWRITE_JPEG_QUALITY, q])
        return (cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
                .astype(np.float32) / 255.0)
    if kind == "warp":
        H, W = x.shape[:2]
        M = np.float32([[1, 0, severity * 8], [0, 1, -severity * 5]])
        return cv2.warpAffine(x, M, (W, H), borderMode=cv2.BORDER_REFLECT)
    raise ValueError(kind)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="pretrained/lpips_alex_randfeat.npz")
    ap.add_argument("--seed", type=int, default=1219)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from loopy_slam_tpu.utils.lpips import _alex_features

    params_np = random_trunk(args.seed)
    params = {k: jnp.asarray(v) for k, v in params_np.items()}

    def layer_dists(img, ref):
        x = jnp.stack([jnp.asarray(img), jnp.asarray(ref)])
        x = x.transpose(0, 3, 1, 2)
        x = 2.0 * x - 1.0
        x = ((x - params["shift"][None, :, None, None])
             / params["scale"][None, :, None, None])
        feats = _alex_features(params, x)
        out = []
        for f in feats:
            norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True)) + 1e-10
            f = f / norm
            out.append(float(jnp.mean(jnp.sum((f[0] - f[1]) ** 2, axis=0))))
        return out  # per-layer mean unweighted distance

    rng = np.random.default_rng(args.seed)
    imgs = base_images()

    # per-layer raw response at the anchor distortion
    anchor = np.zeros(5)
    for img in imgs:
        d = layer_dists(img, distort(img, "noise", ANCHOR_SIGMA, rng))
        anchor += np.asarray(d)
    anchor /= len(imgs)

    # equal per-layer contribution at the anchor, total = ANCHOR_DIST
    # (lin weights multiply the per-channel squared diff before the channel
    # sum, so a uniform per-channel constant c scales the layer's raw
    # distance to exactly c * raw)
    per_layer = ANCHOR_DIST / 5.0
    report = {"anchor_raw": anchor.tolist(), "curves": {}}
    for i, (_, cout, _, _) in enumerate(SPECS, 1):
        c = per_layer / max(anchor[i - 1], 1e-12)
        params_np[f"lin{i}_w"] = np.full(cout, c, np.float32)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **params_np)

    # severity curves with the calibrated bundle (documentation + sanity)
    from loopy_slam_tpu.utils.lpips import lpips_alex
    sev_grid = [0.25, 0.5, 1.0, 2.0]
    for kind, base_sev in [("noise", 0.1), ("blur", 1.0), ("gain", 0.15),
                           ("jpeg", 0.5), ("warp", 0.5)]:
        curve = []
        for mult in sev_grid:
            vals = [lpips_alex(distort(img, kind, base_sev * mult, rng),
                               img, args.out) for img in imgs[:4]]
            curve.append(float(np.mean(vals)))
        report["curves"][kind] = dict(zip(map(str, sev_grid), curve))
        print(f"{kind}: " + " ".join(f"{v:.4f}" for v in curve))

    with open(os.path.splitext(args.out)[0] + "_calibration.json",
              "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
