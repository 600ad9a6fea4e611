"""Color-head saturation robustness (renderer.soft_clamp_logits).

Regression for a seed-dependent collapse observed on TPU: Adam + L1 color
loss can transiently drive pre-sigmoid logits to the hundreds, where
sigmoid'(x) underflows to exact f32 zero — zero gradient means zero Adam
update and the color head latches railed forever. The rational soft clamp
keeps the gradient sign alive (polynomial decay), and Adam — being
magnitude-invariant — walks the head back out.
"""

import jax
import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.models.renderer import soft_clamp_logits
from loopy_slam_tpu.ops import adam


def test_clamp_preserves_representable_colors_and_monotonicity():
    # the clamp stretches the logit parameterization but must keep every
    # practically-needed color reachable (any 8-bit value needs |logit|
    # <= logit(255.5/256) ~ 6.2 < 12) and strictly monotone so L1 optima
    # are unchanged
    x = jnp.linspace(-80.0, 80.0, 4001)
    y = np.asarray(soft_clamp_logits(x))
    assert (np.diff(y) > 0).all()
    cols = np.asarray(jax.nn.sigmoid(soft_clamp_logits(x)))
    assert cols.min() < 1.0 / 512 and cols.max() > 1 - 1.0 / 512


def test_gradient_never_underflows():
    # magnitudes up to 1e6 cover anything Adam-bounded weights can produce;
    # beyond ~1e10 the quotient-rule numerator (1 + x/L) - x/L cancels in
    # f32 and the gradient sign is garbage, but logits cannot get there
    for mag in (1e2, 1e4, 1e6):
        g = jax.grad(lambda x: jax.nn.sigmoid(soft_clamp_logits(x)))(
            jnp.float32(mag))
        assert float(g) > 0.0, f"dead gradient at logit {mag}"
        # the raw sigmoid is already dead here (the latch this guards against)
        if mag >= 1e2:
            raw = jax.grad(lambda x: jax.nn.sigmoid(x))(jnp.float32(mag))
            assert float(raw) == 0.0


def test_adam_recovers_a_railed_color_head():
    """A logit parameter stuck at +300 (railed to color 1.0) must walk back
    to a 0.25 target under Adam + L1 — impossible with a bare sigmoid."""
    def run(head_fn, steps=2000):
        p = {"w": jnp.float32(300.0)}
        st = adam.init(p)
        tgt = 0.25
        def loss(p):
            return jnp.abs(jax.nn.sigmoid(head_fn(p["w"])) - tgt)
        for _ in range(steps):
            g = jax.grad(loss)(p)
            p, st = adam.update(p, g, st, 0.5)
        return float(jax.nn.sigmoid(head_fn(p["w"])))

    recovered = run(soft_clamp_logits)
    assert abs(recovered - 0.25) < 0.05
    stuck = run(lambda x: x)
    assert abs(stuck - 1.0) < 1e-4  # the bare head stays latched
