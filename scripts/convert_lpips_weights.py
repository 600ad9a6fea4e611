#!/usr/bin/env python
"""Convert pretrained LPIPS-alex weights (torch `lpips` package layout) to
the npz bundle loopy_slam_tpu/utils/lpips.py loads.

Usage (on a machine that has the weights; this sandbox has no egress):
    pip install lpips torchvision
    python scripts/convert_lpips_weights.py --out lpips_alex.npz
then stage lpips_alex.npz and set `rendering.lpips_weights` to its path.

Also accepts an already-saved state_dict file (--state-dict) holding the
combined torchvision-AlexNet features + LPIPS lin layers, for offline
conversion without the lpips package.
"""

import argparse

import numpy as np

# lpips v0.1 input normalization constants (ScalingLayer)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features` module indices of the five conv layers
ALEX_CONV_IDX = [0, 3, 6, 8, 10]


def from_lpips_package(out_path: str):
    import lpips as lpips_pkg  # noqa: F401

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    bundle = {"shift": SHIFT, "scale": SCALE}
    for i, idx in enumerate(ALEX_CONV_IDX, start=1):
        bundle[f"conv{i}_w"] = sd[f"net.slice{i}.{idx}.weight"]
        bundle[f"conv{i}_b"] = sd[f"net.slice{i}.{idx}.bias"]
        # 1x1 conv (C_out=1, C_in, 1, 1) -> (C_in,)
        bundle[f"lin{i}_w"] = sd[f"lin{i - 1}.model.1.weight"][0, :, 0, 0]
    np.savez(out_path, **bundle)
    print(f"wrote {out_path}")


def from_state_dict(path: str, out_path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    bundle = {"shift": SHIFT, "scale": SCALE}
    for i, idx in enumerate(ALEX_CONV_IDX, start=1):
        bundle[f"conv{i}_w"] = sd[f"features.{idx}.weight"]
        bundle[f"conv{i}_b"] = sd[f"features.{idx}.bias"]
        bundle[f"lin{i}_w"] = sd[f"lin{i - 1}.weight"].reshape(-1)
    np.savez(out_path, **bundle)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    ap.add_argument("--state-dict", default=None)
    args = ap.parse_args()
    if args.state_dict:
        from_state_dict(args.state_dict, args.out)
    else:
        from_lpips_package(args.out)
