#!/usr/bin/env python
"""Convert the reference's pretrained geometry decoder (middle_fine.pt,
a torch ConvONet checkpoint) into this framework's geo_decoder.pkl format,
so a real-Replica run can warm-start from the SAME weights as the
reference (reference src/Point_SLAM.py:177-198 loads it; our loader is
slam.py _load_pretrained_geo, format produced by tools/pretrain_geo.py).

    python scripts/convert_middle_fine.py pretrained/middle_fine.pt \
        [--out pretrained/geo_decoder.pkl]

Key selection reproduces load_pretrain exactly (Point_SLAM.py:188-197):
entries containing 'decoder' but not 'encoder'; the 'coarse' group is the
middle/geometry decoder (the 'fine' group is unused by Loopy-SLAM's
single-geo-decoder setup and is ignored here). Torch nn.Linear stores
weights (out, in); our pkl stores (in, out), so weights transpose.
Missing entries (e.g. no learnable embedder in the ConvONet checkpoint —
load_state_dict(strict=False) skips them in the reference too) are simply
omitted from the pkl: the loader only overwrites keys that are present.
"""

import argparse
import pickle

import numpy as np

GEO_EMB = 93
GEO_HIDDEN = 32
N_BLOCKS = 5
SKIP = 2


def strip_prefix(key: str) -> str:
    # reference: key[8+7:] strips 'decoder.coarse.'  (Point_SLAM.py:192)
    return key[len("decoder.coarse."):]


def _check(name, arr, shape):
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(
            f"{name}: expected shape {shape}, checkpoint has {arr.shape} — "
            "not a middle_fine geometry-decoder checkpoint?")
    return arr.astype(np.float32)


def convert_state_dict(middle: dict) -> dict:
    """middle: {stripped_key: np.ndarray} for the coarse/middle decoder.
    Returns the geo pkl dict ({B, lin, fc_c, out, B_rel}, partial if the
    checkpoint lacks some groups)."""
    geo = {}
    if "embedder._B" in middle:
        geo["B"] = _check("embedder._B", middle["embedder._B"],
                          (3, GEO_EMB))
    if "embedder_rel_pos._B" in middle:
        geo["B_rel"] = _check("embedder_rel_pos._B",
                              middle["embedder_rel_pos._B"], (3, 10))

    def linear(prefix, in_dim, out_dim):
        w = _check(f"{prefix}.weight", middle[f"{prefix}.weight"],
                   (out_dim, in_dim)).T.copy()
        b = _check(f"{prefix}.bias", middle[f"{prefix}.bias"], (out_dim,))
        return {"w": w, "b": b}

    if all(f"pts_linears.{i}.weight" in middle for i in range(N_BLOCKS)):
        lin = []
        d = GEO_EMB
        for i in range(N_BLOCKS):
            lin.append(linear(f"pts_linears.{i}", d, GEO_HIDDEN))
            d = GEO_HIDDEN + (GEO_EMB if i == SKIP else 0)
        geo["lin"] = lin
    if all(f"fc_c.{i}.weight" in middle for i in range(N_BLOCKS)):
        c_dim = middle["fc_c.0.weight"].shape[1]
        geo["fc_c"] = [linear(f"fc_c.{i}", c_dim, GEO_HIDDEN)
                       for i in range(N_BLOCKS)]
    if "output_linear.weight" in middle:
        geo["out"] = linear("output_linear", GEO_HIDDEN, 1)
    if not geo:
        raise ValueError(
            "no geometry-decoder entries found — is this a middle_fine "
            "ConvONet checkpoint (ckpt['model'] with decoder.coarse.* "
            "keys)?")
    return geo


def load_and_filter(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    model = ckpt.get("model", ckpt)
    middle = {}
    for key, val in model.items():
        if "decoder" in key and "encoder" not in key and "coarse" in key:
            middle[strip_prefix(key)] = val.detach().cpu().numpy()
    return middle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="path to middle_fine.pt")
    ap.add_argument("--out", default="pretrained/geo_decoder.pkl")
    args = ap.parse_args()
    geo = convert_state_dict(load_and_filter(args.ckpt))
    with open(args.out, "wb") as f:
        pickle.dump(geo, f)
    print(f"wrote {args.out}: groups {sorted(geo.keys())}")


if __name__ == "__main__":
    main()
