"""Color-head saturation robustness (renderer.soft_clamp_logits).

Regression for two TPU-observed failure modes of the color head:
LATCH — Adam + L1 drives logits to the hundreds where sigmoid' underflows
to exact f32 zero and the head rails forever; DRIFT — a monotone clamp's
flat-but-sign-consistent tail gradient lets 0/1-railed targets walk the
trunk weights at full lr without bound (measured +-1e7 logits on the
room0-format run). The folding clamp keeps gradients alive inside
|x| <= 24 and makes the task loss itself restore anything beyond it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from loopy_slam_tpu.models.renderer import soft_clamp_logits
from loopy_slam_tpu.ops import adam


def test_clamp_preserves_representable_colors():
    # monotone on the working range, and every practically-needed color
    # reachable at finite logits (any 8-bit value needs |logit| <=
    # logit(255.5/256) ~ 6.2, well inside the fold at 24)
    x = jnp.linspace(-24.0, 24.0, 4001)
    y = np.asarray(soft_clamp_logits(x))
    assert (np.diff(y) > 0).all()
    cols = np.asarray(jax.nn.sigmoid(soft_clamp_logits(x)))
    assert cols.min() < 1.0 / 512 and cols.max() > 1 - 1.0 / 512


def test_fold_and_gradient_alive_everywhere():
    # beyond the fold the output DECLINES (so saturation is not
    # representable and the task loss restores it) but stays bounded,
    # keeping sigmoid' nonzero — no dead gradients anywhere
    for mag in (1e2, 1e4, 1e6):
        out = float(soft_clamp_logits(jnp.float32(mag)))
        assert -16.0 <= out < 8.0
        g = jax.grad(lambda x: jax.nn.sigmoid(soft_clamp_logits(x)))(
            jnp.float32(mag))
        assert float(g) != 0.0, f"dead gradient at logit {mag}"
        # the raw sigmoid is already dead here (the latch this guards
        # against)
        raw = jax.grad(lambda x: jax.nn.sigmoid(x))(jnp.float32(mag))
        assert float(raw) == 0.0


def test_adam_recovers_a_railed_color_head():
    """A logit parameter stuck at +300 (railed) must walk back to a 0.25
    target under Adam + L1 — impossible with a bare sigmoid."""
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


def test_railed_target_drift_is_bounded():
    """The round-1 clamp was monotone with a sign-consistent tail
    gradient: a target of EXACT 1.0 (decoded JPEG produces those) made
    Adam walk the logit upward at full lr forever (+-1e7 after 340k
    iterations on the room0 run). With the fold, the task loss itself
    caps the walk near the fold point."""
    p = {"w": jnp.float32(5.0)}
    st = adam.init(p)

    def loss(p):
        return jnp.abs(jax.nn.sigmoid(soft_clamp_logits(p["w"])) - 1.0)

    for _ in range(5000):
        g = jax.grad(loss)(p)
        p, st = adam.update(p, g, st, 0.5)
    w = float(p["w"])
    assert abs(w) < 100.0, f"unbounded drift: logit reached {w}"
    # and the represented color is still the saturated optimum
    assert float(jax.nn.sigmoid(soft_clamp_logits(p["w"]))) > 0.99
