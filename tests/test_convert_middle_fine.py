"""The middle_fine.pt -> geo_decoder.pkl converter: a synthetic torch
checkpoint with the reference's key schema round-trips into the pkl
layout our loader consumes, and the converted weights produce the same
linear algebra as the torch layers (weight transposition correct)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from convert_middle_fine import (GEO_EMB, GEO_HIDDEN, N_BLOCKS, SKIP,
                                 convert_state_dict, load_and_filter)

torch = pytest.importorskip("torch")


def _synthetic_ckpt(tmp_path):
    g = torch.Generator().manual_seed(0)
    model = {}

    def lin(prefix, in_dim, out_dim):
        model[f"decoder.coarse.{prefix}.weight"] = torch.randn(
            (out_dim, in_dim), generator=g)
        model[f"decoder.coarse.{prefix}.bias"] = torch.randn(
            (out_dim,), generator=g)

    model["decoder.coarse.embedder._B"] = torch.randn((3, GEO_EMB),
                                                      generator=g) * 25
    d = GEO_EMB
    for i in range(N_BLOCKS):
        lin(f"pts_linears.{i}", d, GEO_HIDDEN)
        d = GEO_HIDDEN + (GEO_EMB if i == SKIP else 0)
    for i in range(N_BLOCKS):
        lin(f"fc_c.{i}", 32, GEO_HIDDEN)
    lin("output_linear", GEO_HIDDEN, 1)
    # distractors that the reference's filter drops (Point_SLAM.py:188-191)
    model["encoder.conv0.weight"] = torch.randn((8, 8), generator=g)
    model["decoder.fine.output_linear.weight"] = torch.randn(
        (1, GEO_HIDDEN), generator=g)
    model["decoder.fine.output_linear.bias"] = torch.randn(
        (1,), generator=g)
    path = str(tmp_path / "middle_fine.pt")
    torch.save({"model": model}, path)
    return path, model


def test_convert_roundtrip(tmp_path):
    path, model = _synthetic_ckpt(tmp_path)
    middle = load_and_filter(path)
    assert "encoder.conv0.weight" not in middle
    assert not any("fine" in k for k in middle)
    geo = convert_state_dict(middle)
    assert sorted(geo.keys()) == ["B", "fc_c", "lin", "out"]
    assert len(geo["lin"]) == N_BLOCKS and len(geo["fc_c"]) == N_BLOCKS
    # weight orientation: our (in, out) must equal torch (out, in).T
    w_t = model["decoder.coarse.pts_linears.3.weight"].numpy()
    assert geo["lin"][3]["w"].shape == (GEO_HIDDEN + GEO_EMB, GEO_HIDDEN)
    np.testing.assert_allclose(geo["lin"][3]["w"], w_t.T)
    # algebraic equivalence on block 0: x @ w + b == torch linear(x)
    x = np.random.default_rng(1).normal(size=(4, GEO_EMB)).astype(np.float32)
    ours = x @ geo["lin"][0]["w"] + geo["lin"][0]["b"]
    theirs = (torch.from_numpy(x)
              @ model["decoder.coarse.pts_linears.0.weight"].T
              + model["decoder.coarse.pts_linears.0.bias"]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_converted_pkl_loads_into_session_params(tmp_path):
    """The emitted pkl slots into params['geo'] via the production loader
    and changes the decoder output (i.e. it actually loaded)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from loopy_slam_tpu.models.decoder import geo_forward, init_decoders
    from conftest import small_cfg

    path, _ = _synthetic_ckpt(tmp_path)
    geo = convert_state_dict(load_and_filter(path))
    pkl = str(tmp_path / "geo_decoder.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(geo, f)

    cfg = small_cfg()
    params = init_decoders(jax.random.PRNGKey(0), cfg)
    with open(pkl, "rb") as f:
        loaded = pickle.load(f)
    p = np.random.default_rng(2).normal(size=(16, GEO_EMB // 31, 3)
                                        ).astype(np.float32)
    p = p.reshape(16, -1)[:, :3]
    c = np.zeros((16, 32), np.float32)
    before = np.asarray(geo_forward(params["geo"], jnp.asarray(p),
                                    jnp.asarray(c)))
    for k, v in loaded.items():
        if k in params["geo"]:
            params["geo"][k] = jax.tree.map(jnp.asarray, v)
    after = np.asarray(geo_forward(params["geo"], jnp.asarray(p),
                                   jnp.asarray(c)))
    assert not np.allclose(before, after)
