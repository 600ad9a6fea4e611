import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.ops.compositing import composite


def reference_composite(raw_rgb, raw_occ, z_vals, coef=0.1):
    """NumPy oracle transcribing the published math of Point-SLAM eq. (7)
    (occupancy sigmoid, front-to-back alpha compositing, weight-normalized
    outputs), cf. reference src/common.py:382-422."""
    alpha = 1.0 / (1.0 + np.exp(-coef * raw_occ))
    ones = np.ones((alpha.shape[0], 1))
    trans = np.cumprod(
        np.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1)[:, :-1]
    weights = alpha * trans
    wsum = weights.sum(-1, keepdims=True) + 1e-10
    rgb = (weights[..., None] * raw_rgb).sum(-2) / wsum
    depth = (weights * z_vals).sum(-1) / wsum[..., 0]
    var = (weights * (z_vals - depth[..., None]) ** 2).sum(-1)
    return depth, var, rgb, weights


def test_composite_matches_oracle(rng):
    R, S = 16, 5
    raw_rgb = rng.uniform(size=(R, S, 3)).astype(np.float32)
    raw_occ = rng.normal(size=(R, S)).astype(np.float32) * 10
    z = np.sort(rng.uniform(0.5, 3.0, size=(R, S)).astype(np.float32), axis=-1)
    d, v, c, w = composite(jnp.asarray(raw_rgb), jnp.asarray(raw_occ),
                           jnp.asarray(z))
    d0, v0, c0, w0 = reference_composite(raw_rgb, raw_occ, z)
    np.testing.assert_allclose(np.asarray(d), d0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v0, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), c0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w0, rtol=1e-4, atol=1e-6)


def test_opaque_first_sample_dominates():
    R, S = 1, 5
    occ = np.full((R, S), -100.0, np.float32)
    occ[0, 2] = 1000.0  # saturated occupancy at sample 2
    rgb = np.zeros((R, S, 3), np.float32)
    rgb[0, 2] = [0.2, 0.4, 0.6]
    z = np.linspace(1.0, 2.0, S, dtype=np.float32)[None]
    d, v, c, _ = composite(jnp.asarray(rgb), jnp.asarray(occ), jnp.asarray(z))
    np.testing.assert_allclose(float(d[0]), z[0, 2], atol=1e-4)
    np.testing.assert_allclose(np.asarray(c[0]), rgb[0, 2], atol=1e-4)
    # residual variance from the sigmoid(-10) leakage of the -100 samples
    assert float(v[0]) < 1e-4
