"""Fused Pallas kernels for the decoder MLP trunks.

**MEASURED NEGATIVE RESULT — deliberately unwired.** On a real v5e these
kernels LOSE to plain XLA: 1.3 ms forward at N=25k vs 0.2 ms for XLA's own
fusion of the same trunk — the in-kernel layer chain serializes where XLA
pipelines layers against HBM traffic. The decoders therefore use plain XLA
trunks (models/decoder.py); this module is kept only as the documented
experiment record so the next person doesn't redo it expecting a win. Do
not wire it in without re-measuring.

The original hypothesis (kept for context): the NICER-style trunks (reference src/conv_onet/models/decoder.py:106-288,
345-546: 5 Dense blocks with per-block feature injection and a skip concat
after block 2) are memory-layout-bound as plain XLA on TPU: hidden widths
of 32/128 leave most of the MXU's 128 lanes idle, every layer round-trips
its (N, H) activation through HBM, and the five fc_c injections are five
separate skinny matmuls. Measured on a v5e, the three trunk passes
(geometry, color, neighbor transform) cost ~5 ms fwd+bwd per mapping
iteration at N=25k — ~10x off matmul speed-of-light.

This module runs each trunk as ONE Pallas kernel:
  * all weights live in VMEM for the whole call (they total < 1 MB);
  * activations never leave VMEM between layers;
  * every lane dimension is zero-padded to 128 so each layer is a clean
    (B, 128)@(128, 128) MXU matmul (zero-padding rows/cols of the weight
    matrices leaves the math identical; padding is done once per call on
    the host side of the kernel);
  * matmuls run in bf16 with f32 accumulation — the same numerics as
    XLA's default (single-pass bf16) matmul precision on TPU;
  * the five feature injections collapse into one (C, 5H) matmul;
  * backward is a second kernel that recomputes the forward (cheap, it is
    all MXU work) and accumulates weight gradients in f32 across the
    sequential TPU grid, so fwd+bwd never materializes per-layer
    activations in HBM.

The public entry points `trunk_apply` (5-block trunk) and `mlp2_apply`
(2-layer neighbor MLP) carry custom VJPs and fall back to plain XLA when
running on CPU (tests) so the test suite stays fast and exact-f32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCKS = 5
SKIP = 2
LANE = 128


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    p = (-n) % mult
    if p == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, p)
    return jnp.pad(x, pads)


def _act_fwd(x, act):
    if act == "relu":
        return jax.nn.relu(x)
    # softplus100: log(1 + exp(100 x)) / 100, numerically stable
    return jnp.logaddexp(0.0, 100.0 * x) / 100.0


def _act_deriv(pre, act):
    if act == "relu":
        return (pre > 0).astype(pre.dtype)
    return jax.nn.sigmoid(100.0 * pre)


def _dot(a, b):
    """bf16 MXU matmul with f32 accumulation (XLA-default numerics)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b contracting the row (batch) dimension: (B,M),(B,N)->(M,N)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_bt(a, b):
    """a @ b^T contracting the last dims: (B,N),(M,N)->(B,M).

    Runs at HIGHEST (true-f32) precision: these are the cotangent-
    propagation dots of the backward pass, where bf16 rounding compounds
    across layers into several-percent input-gradient error (pose
    gradients in tracking flow through this chain). The matmuls are tiny,
    so the extra MXU passes are free.
    """
    return jax.lax.dot_general(
        a.astype(jnp.float32), b.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# 5-block trunk
# ---------------------------------------------------------------------------
#
# forward (matching decoder._trunk):
#   h = emb
#   for i in 0..4:  h = act(h @ W_i + b_i) + (c @ F_i + f_i)
#                   if i == SKIP: h = concat([emb, h])
#   out = h @ Wo + bo
# The concat is expressed as a split matmul: W3 = [W3e; W3h].


def _trunk_fwd_kernel(emb_ref, c_ref, w0, w1, w2, w3e, w3h, w4, bs, fcat,
                      fb, wo, bo, out_ref, *, act: str):
    emb = emb_ref[:]
    c = c_ref[:]
    cf = _dot(c, fcat[:]) + fb[:]
    H = w1.shape[0]
    b = bs[:]
    h = _act_fwd(_dot(emb, w0[:]) + b[0:1, :], act) + cf[:, :H]
    h = _act_fwd(_dot(h, w1[:]) + b[1:2, :], act) + cf[:, H:2 * H]
    h = _act_fwd(_dot(h, w2[:]) + b[2:3, :], act) + cf[:, 2 * H:3 * H]
    h = _act_fwd(_dot(emb, w3e[:]) + _dot(h, w3h[:]) + b[3:4, :],
                 act) + cf[:, 3 * H:4 * H]
    h = _act_fwd(_dot(h, w4[:]) + b[4:5, :], act) + cf[:, 4 * H:]
    out_ref[:] = _dot(h, wo[:]) + bo[:]


def _trunk_bwd_kernel(emb_ref, c_ref, w0, w1, w2, w3e, w3h, w4, bs, fcat,
                      fb, wo, bo, g_ref,
                      demb_ref, dc_ref, dw0, dw1, dw2, dw3e, dw3h, dw4,
                      dbs, dfcat, dfb, dwo, dbo, *, act: str):
    emb = emb_ref[:]
    c = c_ref[:]
    b = bs[:]
    H = w1.shape[0]
    # --- recompute forward, keeping pre-activations and post values
    cf = _dot(c, fcat[:]) + fb[:]
    pre0 = _dot(emb, w0[:]) + b[0:1, :]
    h0 = _act_fwd(pre0, act) + cf[:, :H]
    pre1 = _dot(h0, w1[:]) + b[1:2, :]
    h1 = _act_fwd(pre1, act) + cf[:, H:2 * H]
    pre2 = _dot(h1, w2[:]) + b[2:3, :]
    h2 = _act_fwd(pre2, act) + cf[:, 2 * H:3 * H]
    pre3 = _dot(emb, w3e[:]) + _dot(h2, w3h[:]) + b[3:4, :]
    h3 = _act_fwd(pre3, act) + cf[:, 3 * H:4 * H]
    pre4 = _dot(h3, w4[:]) + b[4:5, :]
    h4 = _act_fwd(pre4, act) + cf[:, 4 * H:]

    g = g_ref[:]
    # --- backward
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0[:] = jnp.zeros_like(dw0)
        dw1[:] = jnp.zeros_like(dw1)
        dw2[:] = jnp.zeros_like(dw2)
        dw3e[:] = jnp.zeros_like(dw3e)
        dw3h[:] = jnp.zeros_like(dw3h)
        dw4[:] = jnp.zeros_like(dw4)
        dbs[:] = jnp.zeros_like(dbs)
        dfcat[:] = jnp.zeros_like(dfcat)
        dfb[:] = jnp.zeros_like(dfb)
        dwo[:] = jnp.zeros_like(dwo)
        dbo[:] = jnp.zeros_like(dbo)

    dwo[:] += _dot_t(h4, g)
    dbo[:] += jnp.sum(g, axis=0, keepdims=True)
    gh4 = _dot_bt(g, wo[:])                      # d h4 (post)

    ga4 = gh4 * _act_deriv(pre4, act)
    dw4[:] += _dot_t(h3, ga4)
    dbs[4:5, :] += jnp.sum(ga4, axis=0, keepdims=True)
    gh3 = _dot_bt(ga4, w4[:])

    ga3 = gh3 * _act_deriv(pre3, act)
    dw3e[:] += _dot_t(emb, ga3)
    dw3h[:] += _dot_t(h2, ga3)
    dbs[3:4, :] += jnp.sum(ga3, axis=0, keepdims=True)
    demb = _dot_bt(ga3, w3e[:])
    gh2 = _dot_bt(ga3, w3h[:])

    ga2 = gh2 * _act_deriv(pre2, act)
    dw2[:] += _dot_t(h1, ga2)
    dbs[2:3, :] += jnp.sum(ga2, axis=0, keepdims=True)
    gh1 = _dot_bt(ga2, w2[:])

    ga1 = gh1 * _act_deriv(pre1, act)
    dw1[:] += _dot_t(h0, ga1)
    dbs[1:2, :] += jnp.sum(ga1, axis=0, keepdims=True)
    gh0 = _dot_bt(ga1, w1[:])

    ga0 = gh0 * _act_deriv(pre0, act)
    dw0[:] += _dot_t(emb, ga0)
    dbs[0:1, :] += jnp.sum(ga0, axis=0, keepdims=True)
    demb = demb + _dot_bt(ga0, w0[:])

    dcf = jnp.concatenate([gh0, gh1, gh2, gh3, gh4], axis=1)  # (B, 5H)
    dfcat[:] += _dot_t(c, dcf)
    dfb[:] += jnp.sum(dcf, axis=0, keepdims=True)
    dc_ref[:] = _dot_bt(dcf, fcat[:])
    demb_ref[:] = demb


def _pack_trunk_weights(lin: List[Dict[str, Any]], fc_c: List[Dict[str, Any]],
                        out: Dict[str, Any], E: int):
    """Zero-pad trunk weights to 128-lane tiles; split the skip layer."""
    H = lin[1]["w"].shape[1]
    Ep = -(-E // LANE) * LANE
    Hp = -(-H // LANE) * LANE
    O = out["w"].shape[1]
    Op = -(-O // LANE) * LANE
    C = fc_c[0]["w"].shape[0]
    Cp = -(-C // LANE) * LANE

    def pad2(w, r, c_):
        return jnp.pad(w, ((0, r - w.shape[0]), (0, c_ - w.shape[1])))

    w3 = lin[3]["w"]  # (E + H, H), emb rows first (decoder._trunk concat)
    packed = dict(
        w0=pad2(lin[0]["w"], Ep, Hp),
        w1=pad2(lin[1]["w"], Hp, Hp),
        w2=pad2(lin[2]["w"], Hp, Hp),
        w3e=pad2(w3[:E], Ep, Hp),
        w3h=pad2(w3[E:], Hp, Hp),
        w4=pad2(lin[4]["w"], Hp, Hp),
        bs=jnp.stack([jnp.pad(lin[i]["b"], (0, Hp - H))
                      for i in range(N_BLOCKS)]),
        fcat=jnp.concatenate(
            [pad2(fc_c[i]["w"], Cp, Hp) for i in range(N_BLOCKS)], axis=1),
        fb=jnp.concatenate(
            [jnp.pad(fc_c[i]["b"], (0, Hp - H))
             for i in range(N_BLOCKS)])[None, :],
        wo=pad2(out["w"], Hp, Op),
        bo=jnp.pad(out["b"], (0, Op - O))[None, :],
    )
    return packed, (E, H, O, C, Ep, Hp, Op, Cp)


_W_ORDER = ("w0", "w1", "w2", "w3e", "w3h", "w4", "bs", "fcat", "fb",
            "wo", "bo")


def _whole(shape):
    """BlockSpec for an operand kept whole in VMEM on every grid step."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("act", "block", "interpret"))
def _trunk_fwd_call(emb_p, c_p, packed, act, block, interpret):
    Np, Ep = emb_p.shape
    Cp = c_p.shape[1]
    Hp = packed["w1"].shape[0]
    Op = packed["wo"].shape[1]
    ws = [packed[k] for k in _W_ORDER]
    return pl.pallas_call(
        functools.partial(_trunk_fwd_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((Np, Op), jnp.float32),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, Ep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_whole(w.shape) for w in ws],
        out_specs=pl.BlockSpec((block, Op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emb_p, c_p, *ws)


@functools.partial(jax.jit, static_argnames=("act", "block", "interpret"))
def _trunk_bwd_call(emb_p, c_p, packed, g_p, act, block, interpret):
    Np, Ep = emb_p.shape
    Cp = c_p.shape[1]
    Hp = packed["w1"].shape[0]
    Op = packed["wo"].shape[1]
    ws = [packed[k] for k in _W_ORDER]
    out_shapes = (
        jax.ShapeDtypeStruct((Np, Ep), jnp.float32),   # demb
        jax.ShapeDtypeStruct((Np, Cp), jnp.float32),   # dc
    ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws)
    out_specs = (
        pl.BlockSpec((block, Ep), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ) + tuple(_whole(w.shape) for w in ws)
    outs = pl.pallas_call(
        functools.partial(_trunk_bwd_kernel, act=act),
        out_shape=out_shapes,
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, Ep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_whole(w.shape) for w in ws] + [
            pl.BlockSpec((block, Op), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(emb_p, c_p, *ws, g_p)
    demb, dc = outs[0], outs[1]
    dws = dict(zip(_W_ORDER, outs[2:]))
    return demb, dc, dws


# Tests set _FORCE_INTERPRET = True to exercise the Pallas kernels on CPU
# via the interpreter; by default CPU uses the exact-f32 XLA fallback.
_FORCE_INTERPRET = False


def _use_pallas():
    return _FORCE_INTERPRET or jax.devices()[0].platform != "cpu"


def _interp():
    return _FORCE_INTERPRET and jax.devices()[0].platform == "cpu"


_BLOCK = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def trunk_apply(emb, c, weights, act: str):
    """Fused 5-block trunk: emb (N, E), c (N, C) -> out (N, O).

    weights: {"lin": [{"w","b"}]*5, "fc_c": [{"w","b"}]*5, "out": {"w","b"}}
    — the decoder's parameter sub-pytree, unchanged. Gradients flow to emb,
    c, and all weights. Numerics match XLA's default TPU matmul precision
    (bf16 multiply, f32 accumulate).
    """
    out, _ = _trunk_fwd_res(emb, c, weights, act)
    return out


def _trunk_fwd_res(emb, c, weights, act):
    E = emb.shape[1]
    O = weights["out"]["w"].shape[1]
    if not _use_pallas():
        # exact-f32 XLA fallback (CPU/tests)
        h = emb
        for i in range(N_BLOCKS):
            h = _act_fwd(h @ weights["lin"][i]["w"] + weights["lin"][i]["b"],
                         act)
            h = h + (c @ weights["fc_c"][i]["w"] + weights["fc_c"][i]["b"])
            if i == SKIP:
                h = jnp.concatenate([emb, h], axis=-1)
        out = h @ weights["out"]["w"] + weights["out"]["b"]
        return out, (emb, c, weights)
    N = emb.shape[0]
    packed, dims = _pack_trunk_weights(weights["lin"], weights["fc_c"],
                                       weights["out"], E)
    Np = -(-N // _BLOCK) * _BLOCK
    emb_p = _pad_to(_pad_to(emb, 1, LANE), 0, _BLOCK)
    c_p = _pad_to(_pad_to(c, 1, LANE), 0, _BLOCK)
    out = _trunk_fwd_call(emb_p, c_p, packed, act, _BLOCK, _interp())
    return out[:N, :O], (emb, c, weights)


def _trunk_vjp_fwd(emb, c, weights, act):
    return _trunk_fwd_res(emb, c, weights, act)


def _trunk_vjp_bwd(act, res, g):
    emb, c, weights = res
    if not _use_pallas():
        def f(e, cc, w):
            h = e
            for i in range(N_BLOCKS):
                h = _act_fwd(h @ w["lin"][i]["w"] + w["lin"][i]["b"], act)
                h = h + (cc @ w["fc_c"][i]["w"] + w["fc_c"][i]["b"])
                if i == SKIP:
                    h = jnp.concatenate([e, h], axis=-1)
            return h @ w["out"]["w"] + w["out"]["b"]
        _, vjp = jax.vjp(f, emb, c, weights)
        return vjp(g)
    N, E = emb.shape
    C = c.shape[1]
    H = weights["lin"][1]["w"].shape[1]
    O = weights["out"]["w"].shape[1]
    packed, dims = _pack_trunk_weights(weights["lin"], weights["fc_c"],
                                       weights["out"], E)
    Hp = packed["w1"].shape[0]
    emb_p = _pad_to(_pad_to(emb, 1, LANE), 0, _BLOCK)
    c_p = _pad_to(_pad_to(c, 1, LANE), 0, _BLOCK)
    g_p = _pad_to(_pad_to(g.astype(jnp.float32), 1, LANE), 0, _BLOCK)
    demb, dc, dws = _trunk_bwd_call(emb_p, c_p, packed, g_p, act,
                                    _BLOCK, _interp())
    w3 = jnp.concatenate([dws["w3e"][:E, :H], dws["w3h"][:H, :H]], axis=0)
    dweights = {
        "lin": [
            {"w": dws["w0"][:E, :H], "b": dws["bs"][0, :H]},
            {"w": dws["w1"][:H, :H], "b": dws["bs"][1, :H]},
            {"w": dws["w2"][:H, :H], "b": dws["bs"][2, :H]},
            {"w": w3, "b": dws["bs"][3, :H]},
            {"w": dws["w4"][:H, :H], "b": dws["bs"][4, :H]},
        ],
        "fc_c": [
            {"w": dws["fcat"][:C, i * Hp:i * Hp + H],
             "b": dws["fb"][0, i * Hp:i * Hp + H]}
            for i in range(N_BLOCKS)
        ],
        "out": {"w": dws["wo"][:H, :O], "b": dws["bo"][0, :O]},
    }
    return demb[:N, :E], dc[:N, :C], dweights


trunk_apply.defvjp(_trunk_vjp_fwd, _trunk_vjp_bwd)


# ---------------------------------------------------------------------------
# 2-layer neighbor MLP: out = act(x @ w1 + b1) @ w2 + b2
# ---------------------------------------------------------------------------

def _mlp2_fwd_kernel(x_ref, w1, b1, w2, b2, out_ref, *, act):
    h = _act_fwd(_dot(x_ref[:], w1[:]) + b1[:], act)
    out_ref[:] = _dot(h, w2[:]) + b2[:]


def _mlp2_bwd_kernel(x_ref, w1, b1, w2, b2, g_ref,
                     dx_ref, dw1, db1, dw2, db2, *, act):
    x = x_ref[:]
    pre = _dot(x, w1[:]) + b1[:]
    h = _act_fwd(pre, act)
    g = g_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1[:] = jnp.zeros_like(dw1)
        db1[:] = jnp.zeros_like(db1)
        dw2[:] = jnp.zeros_like(dw2)
        db2[:] = jnp.zeros_like(db2)

    dw2[:] += _dot_t(h, g)
    db2[:] += jnp.sum(g, axis=0, keepdims=True)
    gh = _dot_bt(g, w2[:]) * _act_deriv(pre, act)
    dw1[:] += _dot_t(x, gh)
    db1[:] += jnp.sum(gh, axis=0, keepdims=True)
    dx_ref[:] = _dot_bt(gh, w1[:])


@functools.partial(jax.jit, static_argnames=("act", "block", "interpret"))
def _mlp2_fwd_call(x_p, w1, b1, w2, b2, act, block, interpret):
    Np, Ip = x_p.shape
    Op = w2.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp2_fwd_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((Np, Op), jnp.float32),
        grid=(Np // block,),
        in_specs=[pl.BlockSpec((block, Ip), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [_whole(w.shape) for w in (w1, b1, w2, b2)],
        out_specs=pl.BlockSpec((block, Op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("act", "block", "interpret"))
def _mlp2_bwd_call(x_p, w1, b1, w2, b2, g_p, act, block, interpret):
    Np, Ip = x_p.shape
    Op = w2.shape[1]
    out_shapes = (
        jax.ShapeDtypeStruct((Np, Ip), jnp.float32),
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block, Ip), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _whole(w1.shape), _whole(b1.shape), _whole(w2.shape),
        _whole(b2.shape),
    )
    return pl.pallas_call(
        functools.partial(_mlp2_bwd_kernel, act=act),
        out_shape=out_shapes,
        grid=(Np // block,),
        in_specs=[pl.BlockSpec((block, Ip), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [_whole(w.shape) for w in (w1, b1, w2, b2)]
        + [pl.BlockSpec((block, Op), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        interpret=interpret,
    )(x_p, w1, b1, w2, b2, g_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def mlp2_apply(x, w1, b1, w2, b2, act: str):
    """Fused 2-layer MLP: act(x @ w1 + b1) @ w2 + b2, any leading shape."""
    out, _ = _mlp2_fwd_res(x, w1, b1, w2, b2, act)
    return out


def _mlp2_fwd_res(x, w1, b1, w2, b2, act):
    if not _use_pallas():
        return _act_fwd(x @ w1 + b1, act) @ w2 + b2, (x, w1, b1, w2, b2)
    lead = x.shape[:-1]
    I, H = w1.shape
    O = w2.shape[1]
    x2 = x.reshape(-1, I)
    N = x2.shape[0]
    x_p = _pad_to(_pad_to(x2, 1, LANE), 0, _BLOCK)
    w1p = _pad_to(_pad_to(w1, 0, LANE), 1, LANE)
    b1p = _pad_to(b1[None, :], 1, LANE)
    w2p = _pad_to(_pad_to(w2, 0, LANE), 1, LANE)
    b2p = _pad_to(b2[None, :], 1, LANE)
    out = _mlp2_fwd_call(x_p, w1p, b1p, w2p, b2p, act, _BLOCK,
                         _interp())
    return out[:N, :O].reshape(*lead, O), (x, w1, b1, w2, b2)


def _mlp2_vjp_fwd(x, w1, b1, w2, b2, act):
    return _mlp2_fwd_res(x, w1, b1, w2, b2, act)


def _mlp2_vjp_bwd(act, res, g):
    x, w1, b1, w2, b2 = res
    if not _use_pallas():
        def f(x_, w1_, b1_, w2_, b2_):
            return _act_fwd(x_ @ w1_ + b1_, act) @ w2_ + b2_
        _, vjp = jax.vjp(f, x, w1, b1, w2, b2)
        return vjp(g)
    lead = x.shape[:-1]
    I, H = w1.shape
    O = w2.shape[1]
    x2 = x.reshape(-1, I)
    N = x2.shape[0]
    x_p = _pad_to(_pad_to(x2, 1, LANE), 0, _BLOCK)
    w1p = _pad_to(_pad_to(w1, 0, LANE), 1, LANE)
    b1p = _pad_to(b1[None, :], 1, LANE)
    w2p = _pad_to(_pad_to(w2, 0, LANE), 1, LANE)
    b2p = _pad_to(b2[None, :], 1, LANE)
    g_p = _pad_to(_pad_to(g.reshape(-1, O).astype(jnp.float32), 1, LANE),
                  0, _BLOCK)
    dx, dw1, db1, dw2, db2 = _mlp2_bwd_call(
        x_p, w1p, b1p, w2p, b2p, g_p, act, _BLOCK, _interp())
    return (dx[:N, :I].reshape(x.shape), dw1[:I, :H], db1[0, :H],
            dw2[:H, :O], db2[0, :O])


mlp2_apply.defvjp(_mlp2_vjp_fwd, _mlp2_vjp_bwd)
