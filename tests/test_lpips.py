"""LPIPS-alex (utils/lpips.py) against an independent NumPy oracle.

The oracle reimplements the LPIPS forward pass (AlexNet feature trunk +
unit-normalize + calibrated squared differences) with direct
sliding-window convolutions — structurally unrelated to the JAX
lax.conv implementation under test. Weights are synthetic (the real
pretrained bundle cannot be fetched offline); the math is identical
either way.
"""

import numpy as np
import pytest

from loopy_slam_tpu.utils import metrics
from loopy_slam_tpu.utils.lpips import REQUIRED_KEYS, lpips_alex

SPECS = [  # (cin, cout, k, stride, pad, pool_before)
    (3, 64, 11, 4, 2, False),
    (64, 192, 5, 1, 2, True),
    (192, 384, 3, 1, 1, True),
    (384, 256, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
]


def make_bundle(rng, path):
    bundle = {"shift": np.array([-0.030, -0.088, -0.188], np.float32),
              "scale": np.array([0.458, 0.448, 0.450], np.float32)}
    for i, (cin, cout, k, *_rest) in enumerate(SPECS, start=1):
        bundle[f"conv{i}_w"] = rng.normal(
            0, 1.0 / np.sqrt(cin * k * k), (cout, cin, k, k)).astype(np.float32)
        bundle[f"conv{i}_b"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        bundle[f"lin{i}_w"] = rng.uniform(0, 0.1, (cout,)).astype(np.float32)
    np.savez(path, **bundle)
    return bundle


def _conv2d(x, w, b, stride, pad):
    """x (C,H,W), w (O,C,k,k): direct convolution via window einsum."""
    from numpy.lib.stride_tricks import sliding_window_view

    x = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    k = w.shape[-1]
    win = sliding_window_view(x, (k, k), axis=(1, 2))  # (C,H',W',k,k)
    win = win[:, ::stride, ::stride]
    return np.einsum("chwij,ocij->ohw", win, w) + b[:, None, None]


def _maxpool(x):
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(x, (3, 3), axis=(1, 2))
    return win[:, ::2, ::2].max(axis=(-1, -2))


def oracle_lpips(bundle, img, ref):
    total = 0.0
    feats = []
    for x in (img, ref):
        x = x.transpose(2, 0, 1).astype(np.float64) * 2.0 - 1.0
        x = (x - bundle["shift"][:, None, None]) / bundle["scale"][:, None, None]
        fs = []
        for i, (cin, cout, k, stride, pad, pool) in enumerate(SPECS, 1):
            if pool:
                x = _maxpool(x)
            x = np.maximum(
                _conv2d(x, bundle[f"conv{i}_w"], bundle[f"conv{i}_b"],
                        stride, pad), 0.0)
            fs.append(x)
        feats.append(fs)
    for i in range(5):
        f0, f1 = feats[0][i], feats[1][i]
        f0 = f0 / (np.sqrt((f0 ** 2).sum(0, keepdims=True)) + 1e-10)
        f1 = f1 / (np.sqrt((f1 ** 2).sum(0, keepdims=True)) + 1e-10)
        d2 = (f0 - f1) ** 2
        w = bundle[f"lin{i + 1}_w"][:, None, None]
        total += (d2 * w).sum(0).mean()
    return total


def test_lpips_matches_numpy_oracle(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "lpips_test.npz")
    bundle = make_bundle(rng, path)
    img = rng.uniform(0, 1, (64, 72, 3)).astype(np.float32)
    ref = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    got = lpips_alex(img, ref, path)
    want = oracle_lpips(bundle, img, ref)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    assert got > 0
    # identical images -> exactly zero distance
    assert lpips_alex(img, img, path) == pytest.approx(0.0, abs=1e-7)


def test_metrics_lpips_gating(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    assert metrics.lpips(img, img, None) is None
    with pytest.raises(Exception):
        metrics.lpips(img, img, str(tmp_path / "missing.npz"))
    path = str(tmp_path / "b.npz")
    make_bundle(rng, path)
    assert isinstance(metrics.lpips(img, img, path), float)


def test_bundle_validation(tmp_path):
    path = str(tmp_path / "bad.npz")
    np.savez(path, shift=np.zeros(3))
    with pytest.raises(ValueError, match="missing"):
        from loopy_slam_tpu.utils.lpips import load_lpips
        load_lpips(path)
    assert len(REQUIRED_KEYS) == 17


def test_randfeat_bundle_monotone():
    """The shipped random-feature calibration bundle (scripts/
    make_lpips_randfeat.py) must behave like a perceptual metric: zero for
    identical images, monotone in distortion severity, anchored near 0.22
    for sigma=0.1 Gaussian noise (its calibration target)."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "pretrained", "lpips_alex_randfeat.npz")
    assert os.path.exists(path), "shipped bundle missing"
    from loopy_slam_tpu.utils.metrics import lpips

    rng = np.random.default_rng(3)
    img = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    assert lpips(img, img, path) < 1e-6
    prev = 0.0
    for sigma in (0.02, 0.05, 0.1, 0.2):
        noisy = np.clip(img + rng.normal(0, sigma, img.shape),
                        0, 1).astype(np.float32)
        val = lpips(noisy, img, path)
        assert val > prev, (sigma, val, prev)
        prev = val
    anchor = lpips(np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
                   .astype(np.float32), img, path)
    assert 0.05 < anchor < 0.6, anchor
