"""Parity of the fused Pallas MLP kernels vs the plain-XLA trunk.

The fused kernels compute in bf16-multiply/f32-accumulate (the TPU's
default matmul numerics), so comparisons carry bf16-scale tolerances.
Runs the kernels through the Pallas interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loopy_slam_tpu.ops import fused_mlp
from loopy_slam_tpu.models import decoder as dec


@pytest.fixture
def force_interpret(monkeypatch):
    monkeypatch.setattr(fused_mlp, "_FORCE_INTERPRET", True)


def _trunk_weights(key, E, H, C, O):
    ks = jax.random.split(key, 12)
    lin = []
    d = E
    for i in range(5):
        lin.append({"w": jax.random.normal(ks[i], (d, H)) * 0.3,
                    "b": jax.random.normal(ks[i + 5], (H,)) * 0.05})
        d = H + (E if i == fused_mlp.SKIP else 0)
    fc_c = [{"w": jax.random.normal(jax.random.fold_in(ks[10], i),
                                    (C, H)) * 0.3,
             "b": jnp.zeros((H,))} for i in range(5)]
    out = {"w": jax.random.normal(ks[11], (H, O)) * 0.3,
           "b": jnp.full((O,), 0.1)}
    return {"lin": lin, "fc_c": fc_c, "out": out}


@pytest.mark.parametrize("act,E,H,O", [("relu", 93, 32, 1),
                                       ("softplus100", 40, 128, 3)])
def test_trunk_forward_parity(force_interpret, act, E, H, O):
    key = jax.random.PRNGKey(0)
    C = 32
    N = 70  # exercises row padding
    w = _trunk_weights(key, E, H, C, O)
    emb = jax.random.normal(jax.random.fold_in(key, 1), (N, E)) * 0.5
    c = jax.random.normal(jax.random.fold_in(key, 2), (N, C)) * 0.5

    actf = jax.nn.relu if act == "relu" else dec.softplus100
    ref = dec._trunk(w["lin"], w["fc_c"], w["out"], emb, c, actf)
    got = fused_mlp.trunk_apply(emb, c, w, act)
    assert got.shape == ref.shape
    scale = np.maximum(1.0, np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2 * scale, rtol=3e-2)


def _bdot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _trunk_bf16(w, emb, c, actf):
    """Oracle with the kernel's forward numerics (bf16 multiply, f32
    accumulate): an f32 forward would flip relu gates at bf16-rounded zero
    crossings, which is a forward-precision property, not a VJP bug."""
    h = emb
    for i in range(5):
        h = actf(_bdot(h, w["lin"][i]["w"]) + w["lin"][i]["b"])
        h = h + (_bdot(c, w["fc_c"][i]["w"]) + w["fc_c"][i]["b"])
        if i == fused_mlp.SKIP:
            h = jnp.concatenate([emb, h], axis=-1)
    return _bdot(h, w["out"]["w"]) + w["out"]["b"]


@pytest.mark.parametrize("act,E,H,O", [("relu", 93, 32, 1),
                                       ("softplus100", 40, 128, 3)])
def test_trunk_grad_parity(force_interpret, act, E, H, O):
    key = jax.random.PRNGKey(3)
    C = 32
    N = 40
    w = _trunk_weights(key, E, H, C, O)
    emb = jax.random.normal(jax.random.fold_in(key, 1), (N, E)) * 0.5
    c = jax.random.normal(jax.random.fold_in(key, 2), (N, C)) * 0.5
    cot = jax.random.normal(jax.random.fold_in(key, 4), (N, O))

    actf = jax.nn.relu if act == "relu" else dec.softplus100

    def loss_ref(emb, c, w):
        return jnp.sum(_trunk_bf16(w, emb, c, actf) * cot)

    def loss_fused(emb, c, w):
        return jnp.sum(fused_mlp.trunk_apply(emb, c, w, act) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(emb, c, w)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(emb, c, w)

    flat_ref, tdef = jax.tree.flatten(g_ref)
    flat_got, tdef2 = jax.tree.flatten(g_got)
    assert tdef == tdef2
    # The fused backward casts cotangents to bf16 (reference autodiff keeps
    # them f32), so compare by relative Frobenius error, not elementwise:
    # isolated relu-gate flips at bf16-rounded zero crossings are expected.
    for a, b in zip(flat_ref, flat_got):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-6)
        assert rel < 0.03, f"relative grad error {rel:.4f} on {a.shape}"


def test_mlp2_forward_and_grad_parity(force_interpret):
    key = jax.random.PRNGKey(7)
    N, K, I, H, O = 30, 8, 52, 128, 32
    x = jax.random.normal(key, (N, K, I)) * 0.5
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (I, H)) * 0.3
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (H,)) * 0.05
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (H, O)) * 0.3
    b2 = jnp.zeros((O,))
    cot = jax.random.normal(jax.random.fold_in(key, 5), (N, K, O))

    def ref(x, w1, b1, w2, b2):
        return dec.softplus100(x @ w1 + b1) @ w2 + b2

    got = fused_mlp.mlp2_apply(x, w1, b1, w2, b2, "softplus100")
    want = ref(x, w1, b1, w2, b2)
    assert got.shape == want.shape
    s = np.maximum(1.0, np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2 * s, rtol=3e-2)

    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * cot),
                     argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_got = jax.grad(
        lambda *a: jnp.sum(fused_mlp.mlp2_apply(*a, "softplus100") * cot),
        argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_ref, g_got):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-6)
        assert rel < 0.03, f"relative grad error {rel:.4f} on {a.shape}"


def test_cpu_fallback_is_exact():
    """Without interpret forcing, CPU uses the exact-f32 XLA path."""
    key = jax.random.PRNGKey(11)
    w = _trunk_weights(key, 93, 32, 32, 1)
    emb = jax.random.normal(key, (17, 93))
    c = jax.random.normal(key, (17, 32))
    ref = dec._trunk(w["lin"], w["fc_c"], w["out"], emb, c, jax.nn.relu)
    got = fused_mlp.trunk_apply(emb, c, w, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
