"""Neural-point decoders: Fourier embedders + geometry/color MLPs.

Functional JAX re-design of the reference's NICER decoder family
(reference src/conv_onet/models/decoder.py:12-626). Parameters are plain
pytrees (dicts of arrays) so the same forward serves tracking (grads to
pose), mapping (grads to features + weights), and meshing, selected purely
by which inputs are differentiated.

Architecture parity (verified against decoder.py):
  geometry MLP: Gaussian-Fourier embed p (learnable B: 3x93, scale 25,
    sin only) -> 5 Dense(…->32) with ReLU, per-block feature injection
    h += fc_c_i(c), skip concat of the embedding after block 2, scalar
    occupancy head. (decoder.py:106-288; forward uses F.relu.)
  color MLP: Fourier embed (fixed B: 3x20, scale 32, sin||cos -> 40),
    5 Dense(…->128) with Softplus(beta=100), feature injection, skip at 2,
    3-channel head + sigmoid (or exposure affine then sigmoid).
    (decoder.py:345-546.)
  neighbor feature transform (color only): per-neighbor
    [fourier(rel_pos; learnable 3x10, scale 32, sin||cos) || feat(32)]
    -> Dense 52->128 -> softplus100 -> Dense 128->32. (decoder.py:307-323.)
  exposure MLP: latent(8) -> 128 -> 12, reshaped to 3x3 affine + bias
    applied to raw rgb before sigmoid. (decoder.py:326-342,534-540.)

Feature interpolation (get_feature_at_pos, decoder.py:180-231,431-492):
inverse-squared-distance (or exp(-20 sqrt(D))) weights over the k=8
neighbors, hard-zeroed (no gradient through the mask) outside the query
radius, L1-normalized; sample positions with < min_nn_num in-radius
neighbors receive N(0, 0.01) noise features instead.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

GEO_HIDDEN = 32
COL_HIDDEN = 128
N_BLOCKS = 5
SKIP = 2
GEO_EMB = 93
COL_EMB = 20
REL_EMB = 10


def _xavier_uniform(key, shape, gain=1.0):
    fan_in, fan_out = shape[0], shape[1]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _dense_relu_stack(key, in_dim, hidden, skip_extra):
    """The 5-block trunk: dims in -> h, h -> h, h -> h, h+emb -> h, h -> h."""
    keys = jax.random.split(key, N_BLOCKS)
    gain = math.sqrt(2.0)  # torch calculate_gain('relu')
    layers = []
    d = in_dim
    for i in range(N_BLOCKS):
        w = _xavier_uniform(keys[i], (d, hidden), gain)
        layers.append({"w": w, "b": jnp.zeros((hidden,))})
        d = hidden + (skip_extra if i == SKIP else 0)
    return layers


def _fc_c_stack(key, c_dim, hidden):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    keys = jax.random.split(key, N_BLOCKS)
    bound = 1.0 / math.sqrt(c_dim)
    out = []
    for k in keys:
        kw, kb = jax.random.split(k)
        out.append({"w": _uniform(kw, (c_dim, hidden), bound),
                    "b": _uniform(kb, (hidden,), bound)})
    return out


def softplus100(x):
    """torch.nn.Softplus(beta=100): log(1 + exp(100 x)) / 100, stable."""
    return jnp.logaddexp(0.0, 100.0 * x) / 100.0


# bf16 trunk matmuls (round-3 perf lever): MLP weight/activation products
# run with bf16 inputs and f32 accumulation, halving the MXU-feed HBM
# traffic of the decode hot path. Fourier phases stay exact f32
# (fourier_embed below). Trace-time switch: set once at startup (before
# any jit) via set_bf16_trunks; flipping it later does NOT invalidate
# already-compiled programs.
_BF16_TRUNKS = True


def set_bf16_trunks(enabled: bool):
    global _BF16_TRUNKS
    _BF16_TRUNKS = bool(enabled)


def _mm(x, w):
    """x @ w with optional bf16 inputs + f32 accumulation (MXU-native)."""
    if not _BF16_TRUNKS:
        return x @ w
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def init_decoders(key, cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Initialize the full decoder parameter pytree."""
    c_dim = cfg["model"]["c_dim"]
    kg, kc = jax.random.split(key)
    kgB, kgT, kgF, kgO, kgR = jax.random.split(kg, 5)
    kcB, kcT, kcF, kcO, kcR, kcN1, kcN2, kcE1, kcE2 = jax.random.split(kc, 9)

    geo = {
        "B": jax.random.normal(kgB, (3, GEO_EMB)) * 25.0,  # learnable
        "lin": _dense_relu_stack(kgT, GEO_EMB, GEO_HIDDEN, GEO_EMB),
        "fc_c": _fc_c_stack(kgF, c_dim, GEO_HIDDEN),
        "out": {
            "w": _xavier_uniform(kgO, (GEO_HIDDEN, 1), math.sqrt(2.0)),
            "b": jnp.zeros((1,)),
        },
        # registered (and trained) by the reference though unused in its
        # geometry forward — kept for checkpoint-shape parity.
        "B_rel": jax.random.normal(kgR, (3, REL_EMB)) * 32.0,
    }
    col_emb_in = 2 * COL_EMB
    if cfg["use_view_direction"]:
        col_emb_in += 2 * COL_EMB if cfg["model"]["encode_viewd"] else 3
    col = {
        "B": jax.random.normal(kcB, (3, COL_EMB)) * 32.0,  # FIXED (buffer)
        "B_view": jax.random.normal(jax.random.fold_in(kcB, 7),
                                    (3, COL_EMB)) * 32.0,
        "B_rel": jax.random.normal(kcR, (3, REL_EMB)) * 32.0,  # learnable
        "lin": _dense_relu_stack(kcT, col_emb_in, COL_HIDDEN, col_emb_in),
        "fc_c": _fc_c_stack(kcF, c_dim, COL_HIDDEN),
        "out": {
            "w": _xavier_uniform(kcO, (COL_HIDDEN, 3), 1.0),
            "b": jnp.zeros((3,)),
        },
        "neigh": {
            "w1": _xavier_uniform(kcN1, (c_dim + 2 * REL_EMB, COL_HIDDEN)),
            "b1": _uniform(jax.random.fold_in(kcN1, 1), (COL_HIDDEN,),
                           1.0 / math.sqrt(c_dim + 2 * REL_EMB)),
            "w2": _xavier_uniform(kcN2, (COL_HIDDEN, c_dim)),
            "b2": _uniform(jax.random.fold_in(kcN2, 1), (c_dim,),
                           1.0 / math.sqrt(COL_HIDDEN)),
        },
        "exposure": {
            "w1": jax.random.normal(kcE1, (cfg["model"]["exposure_dim"], COL_HIDDEN)) * 0.01,
            "b1": jnp.zeros((COL_HIDDEN,)),
            "w2": jax.random.normal(kcE2, (COL_HIDDEN, 12)) * 0.01,
            "b2": jnp.zeros((12,)),
        },
    }
    return {"geo": geo, "col": col}


def trainable_mask(params: Dict[str, Any], cfg: Dict[str, Any]):
    """0/1 pytree: which decoder leaves the mapper optimizes.

    Reference Mapper.py:524-541: with fix_geo_decoder the geometry trunk is
    frozen but its embedders stay trainable; the color decoder trains fully
    except its fixed positional embedder B (a buffer, not a parameter).
    """
    def zeros_like_tree(t):
        return jax.tree.map(lambda x: jnp.zeros_like(x), t)

    def ones_like_tree(t):
        return jax.tree.map(lambda x: jnp.ones_like(x), t)

    fix_geo = cfg["mapping"]["fix_geo_decoder"]
    fix_col = cfg["mapping"]["fix_color_decoder"]
    geo = zeros_like_tree(params["geo"]) if fix_geo else ones_like_tree(params["geo"])
    geo["B"] = jnp.ones_like(params["geo"]["B"])
    geo["B_rel"] = jnp.ones_like(params["geo"]["B_rel"])
    col = zeros_like_tree(params["col"]) if fix_col else ones_like_tree(params["col"])
    col["B"] = jnp.zeros_like(params["col"]["B"])        # fixed buffer
    col["B_view"] = jnp.zeros_like(params["col"]["B_view"])
    if fix_col:
        col["B_rel"] = jnp.ones_like(params["col"]["B_rel"])
    if not cfg["model"]["encode_exposure"]:
        col["exposure"] = zeros_like_tree(params["col"]["exposure"])
    return {"geo": geo, "col": col}


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def fourier_embed(p, B, concat_cos: bool):
    # The phase 2*pi*p@B reaches hundreds of radians at scale 25-32, so
    # the TPU's default bf16 matmul passes would corrupt it by ~1 rad;
    # precision="highest" is exact but 20x slower for this K=3
    # contraction. The broadcast multiply-sum is exact f32 on the VPU.
    # (A historical false lead: swapping these two exact-f32 forms once
    # appeared to toggle a color-training collapse — the real cause was a
    # seed-sensitive sigmoid-saturation latch, fixed by
    # renderer.soft_clamp_logits; either phase form is sound.)
    x = jnp.sum((2.0 * jnp.pi) * p[..., :, None] * B, axis=-2)
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], -1) if concat_cos else jnp.sin(x)


def _trunk(layers, fc_c, out, emb, c, act):
    """The production trunk forward (plain XLA). A hand-fused Pallas
    variant was prototyped and measured 6x SLOWER (negative result
    recorded in BASELINE.md), so the plain form is the product."""
    h = emb
    for i in range(N_BLOCKS):
        h = act(_mm(h, layers[i]["w"]) + layers[i]["b"])
        h = h + (_mm(c, fc_c[i]["w"]) + fc_c[i]["b"])
        if i == SKIP:
            h = jnp.concatenate([emb, h], axis=-1)
    return _mm(h, out["w"]) + out["b"]


def geo_forward(geo, p, c):
    """(N,3),(N,32) -> occupancy logits (N,). ReLU trunk (decoder.py:275-288).

    Stays on the plain-XLA trunk: a hand-fused Pallas kernel was
    measured SLOWER (1.3 vs 0.2 ms fwd at N=25k on a v5e; BASELINE.md)
    — XLA's own fusion already keeps these narrow trunks MXU-resident,
    while an in-kernel layer chain serializes.
    """
    emb = fourier_embed(p, geo["B"], concat_cos=False)
    return _trunk(geo["lin"], geo["fc_c"], geo["out"], emb, c, jax.nn.relu)[..., 0]


def col_forward(col, p, c, views_d=None, use_view_direction=False,
                encode_viewd=True):
    """(N,3),(N,32) -> raw rgb (N,3) BEFORE sigmoid/exposure.

    Softplus(100) trunk (decoder.py:523-533).
    """
    emb = fourier_embed(p, col["B"], concat_cos=True)
    if use_view_direction:
        v = views_d / (jnp.linalg.norm(views_d, axis=-1, keepdims=True) + 1e-12)
        vemb = fourier_embed(v, col["B_view"], True) if encode_viewd else v
        emb = jnp.concatenate([emb, vemb], axis=-1)
    return _trunk(col["lin"], col["fc_c"], col["out"], emb, c, softplus100)


def neighbor_transform(col, feats, rel_pos):
    """Rel-pos-conditioned neighbor features (N,k,32) (decoder.py:477-485)."""
    emb = fourier_embed(rel_pos, col["B_rel"], concat_cos=True)  # (N,k,20)
    x = jnp.concatenate([emb, feats], axis=-1)
    h = softplus100(_mm(x, col["neigh"]["w1"]) + col["neigh"]["b1"])
    return _mm(h, col["neigh"]["w2"]) + col["neigh"]["b2"]


def exposure_affine(col, exposure_feat):
    """Latent (8,) -> (rot 3x3, trans 3) color affine (decoder.py:326-342)."""
    h = softplus100(exposure_feat @ col["exposure"]["w1"] + col["exposure"]["b1"])
    a = h @ col["exposure"]["w2"] + col["exposure"]["b2"]
    return a[:9].reshape(3, 3), a[9:]


def interp_weights(D, r2_bound, weighting="distance"):
    """Inverse-distance (or exponential) interpolation weights (N,k).

    D: squared distances; out-of-radius entries are hard-masked with NO
    gradient through the mask (reference decoder.py:206-220: the zeroing
    happens under torch.no_grad while 1/D keeps grads in tracker mode).
    """
    if weighting == "distance":
        w = 1.0 / (D + 1e-10)
    else:
        w = jnp.exp(-20.0 * jnp.sqrt(jnp.maximum(D, 1e-12)))
    mask = jax.lax.stop_gradient((D <= r2_bound).astype(w.dtype))
    w = w * mask
    return w / (jnp.sum(jnp.abs(w), axis=-1, keepdims=True) + 1e-12)


def interpolate_features(feats, weights, has_neighbors, noise_key, c_dim):
    """Weighted sum + N(0,0.01) noise fill for empty neighborhoods."""
    c = jnp.sum(weights[..., None] * feats, axis=-2)
    noise = 0.01 * jax.random.normal(noise_key, c.shape, c.dtype)
    return jnp.where(has_neighbors[..., None], c, noise)
