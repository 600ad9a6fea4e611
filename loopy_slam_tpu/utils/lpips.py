"""First-party LPIPS (AlexNet variant) in JAX.

Replaces the reference's `torchmetrics...LearnedPerceptualImagePatchSimilarity
(net_type='alex', normalize=True)` (reference src/Mapper.py:1087-1143,
src/tools/eval_images.py:23-49). The network is the standard AlexNet
feature trunk with LPIPS linear calibration heads; weights are NOT bundled
(this environment has no network egress and no torchvision cache) — they
load from an `.npz` staged by the user at `rendering.lpips_weights`, which
`scripts/convert_lpips_weights.py` produces from a torch `lpips` package
checkpoint.

Weight file format (npz keys):
    shift (3,), scale (3,)                 input normalization
    conv1_w (64,3,11,11),  conv1_b (64,)   stride 4, pad 2
    conv2_w (192,64,5,5),  conv2_b (192,)  pad 2       (maxpool 3/2 before)
    conv3_w (384,192,3,3), conv3_b (384,)  pad 1       (maxpool 3/2 before)
    conv4_w (256,384,3,3), conv4_b (256,)  pad 1
    conv5_w (256,256,3,3), conv5_b (256,)  pad 1
    lin1_w (64,), lin2_w (192,), lin3_w (384,), lin4_w (256,), lin5_w (256,)

Semantics (lpips v0.1, alex, spatial=False):
    x in [0,1] -> 2x-1 -> (x - shift)/scale; for each of the five relu
    outputs: unit-normalize along channels, squared difference between the
    two images, per-channel non-negative linear weight, spatial mean; the
    distance is the sum over the five layers.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_CONV_SPECS = [  # (name, stride, pad, pool_before)
    ("conv1", 4, 2, False),
    ("conv2", 1, 2, True),
    ("conv3", 1, 1, True),
    ("conv4", 1, 1, False),
    ("conv5", 1, 1, False),
]

REQUIRED_KEYS = tuple(
    ["shift", "scale"]
    + [f"{n}_w" for n, *_ in _CONV_SPECS]
    + [f"{n}_b" for n, *_ in _CONV_SPECS]
    + [f"lin{i}_w" for i in range(1, 6)]
)


def load_lpips(weights_path: str) -> Dict[str, jnp.ndarray]:
    """Load and validate an LPIPS-alex weight bundle."""
    data = np.load(weights_path)
    missing = [k for k in REQUIRED_KEYS if k not in data]
    if missing:
        raise ValueError(
            f"{weights_path} is not an LPIPS-alex bundle: missing {missing}"
            " (produce one with scripts/convert_lpips_weights.py)")
    return {k: jnp.asarray(np.asarray(data[k], np.float32))
            for k in REQUIRED_KEYS}


def _maxpool_3_2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _alex_features(params, x):
    """x: (N,3,H,W) normalized input -> list of 5 relu feature maps."""
    feats = []
    for name, stride, pad, pool in _CONV_SPECS:
        if pool:
            x = _maxpool_3_2(x)
        x = jax.lax.conv_general_dilated(
            x, params[f"{name}_w"], (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + params[f"{name}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


@jax.jit
def _lpips_pair(params, img, ref):
    """img/ref: (H,W,3) in [0,1] -> scalar LPIPS distance."""
    x = jnp.stack([img, ref]).transpose(0, 3, 1, 2)  # (2,3,H,W)
    x = 2.0 * x - 1.0
    x = (x - params["shift"][None, :, None, None]) \
        / params["scale"][None, :, None, None]
    feats = _alex_features(params, x)
    dist = 0.0
    for i, f in enumerate(feats):
        norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True)) + 1e-10
        f = f / norm
        d2 = (f[0] - f[1]) ** 2                     # (C,h,w)
        w = params[f"lin{i + 1}_w"][:, None, None]
        dist = dist + jnp.mean(jnp.sum(d2 * w, axis=0))
    return dist


@functools.lru_cache(maxsize=2)
def _cached_params(weights_path: str):
    return load_lpips(weights_path)


def lpips_alex(img: np.ndarray, ref: np.ndarray,
               weights_path: str) -> float:
    """LPIPS distance between two (H,W,3) images in [0,1]."""
    params = _cached_params(weights_path)
    return float(_lpips_pair(params, jnp.asarray(img, jnp.float32),
                             jnp.asarray(ref, jnp.float32)))
