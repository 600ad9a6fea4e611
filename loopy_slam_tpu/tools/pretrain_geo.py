"""Pretrain the geometry decoder trunk on procedural synthetic scenes.

The reference ships NICE-SLAM's pretrained `middle_fine.pt` geometry
decoder and keeps it frozen during SLAM (reference src/Point_SLAM.py:
177-198, mapping.fix_geo_decoder=True). That artifact is not
redistributable here, so this tool produces the equivalent: it runs the
framework's own mapping optimization on a set of procedural rooms with the
geometry trunk UNFROZEN, accumulating a trunk that decodes occupancy from
interpolated neighborhood features, and saves it to
pretrained/geo_decoder.pkl (consumed via pretrained_decoders.middle_fine).

CLI: python -m loopy_slam_tpu.tools.pretrain_geo [--scenes 4] [--iters 400]
     [--out pretrained/geo_decoder.pkl]
"""

from __future__ import annotations

import argparse
import copy
import os
import pickle

import numpy as np


def pretrain(n_scenes=4, iters=400, seed=7, verbose=True):
    import jax
    import jax.numpy as jnp

    from ..config import DEFAULTS, update_recursive
    from ..mapping import mapper as mapper_mod
    from ..mapping.point_cloud import MapOptions, init_map, valid_mask
    from ..models.decoder import init_decoders, trainable_mask
    from ..models.renderer import RenderOptions
    from ..ops import adam
    from ..utils.datasets import Synthetic

    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {
        "dataset": "synthetic", "use_dynamic_radius": False,
        "cam": {"H": 120, "W": 160, "fx": 120.0, "fy": 120.0,
                "cx": 79.5, "cy": 59.5, "crop_edge": 0},
        "data": {"n_frames": 8},
        "rendering": {"sample_near_pcl": False},
        "mapping": {"fix_geo_decoder": False},
        "pointcloud": {"capacity": 2 ** 16, "cell_table_size": 2 ** 17},
    })
    key = jax.random.PRNGKey(seed)
    params = init_decoders(key, cfg)
    dec_mask = trainable_mask(params, cfg)  # geo trunk trainable here
    mopts_map = MapOptions.from_cfg(cfg)
    mopts = mapper_mod.MapperOptions.from_cfg(cfg)
    ropts = RenderOptions.from_cfg(cfg)

    rng = np.random.default_rng(seed)
    for s in range(n_scenes):
        scfg = copy.deepcopy(cfg)
        scfg["data"]["box_lo"] = (-rng.uniform(1.2, 2.5, 3)).tolist()
        scfg["data"]["box_hi"] = rng.uniform(1.2, 2.5, 3).tolist()
        ds = Synthetic(scfg)
        state = init_map(mopts_map)
        key, ka = jax.random.split(key)
        frames = []
        for i in range(0, scfg["data"]["n_frames"], 2):
            _, c, d, p = ds[i]
            frames.append((jnp.asarray(c), jnp.asarray(d), jnp.asarray(p)))
            key, kadd = jax.random.split(key)
            state, _ = mapper_mod.add_points_from_frame(
                state, frames[-1][0], frames[-1][1], frames[-1][2],
                frames[-1][2], kadd, mopts_map, mopts, 3000, overlap=None)
        kc = jnp.stack([f[0] for f in frames])
        kd = jnp.stack([f[1] for f in frames])
        kp = jnp.stack([f[2] for f in frames])
        trainable = {"dec": params, "feat": state.feat}
        st = adam.init(trainable)
        lrs_geo = jnp.asarray([0.001, 0.03, 0.0])
        lrs_col = jnp.asarray([0.001, 0.005, 0.005])
        key, km = jax.random.split(key)
        trainable, st, aux = mapper_mod.optimize_map(
            trainable, st, dec_mask, valid_mask(state), state.pos,
            state.grid, kc, kd, kp, None, km,
            jnp.asarray(iters // 2), jnp.asarray(iters // 2),
            lrs_geo, lrs_col, mopts, ropts, 400, False)
        params = trainable["dec"]
        if verbose:
            g, c_, n = [float(a) for a in aux]
            print(f"scene {s}: geo/px {g / max(n, 1):.4f} "
                  f"col/px {c_ / max(n, 1):.4f}")
    return jax.tree.map(np.asarray, params["geo"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--out", default="pretrained/geo_decoder.pkl")
    args = ap.parse_args()
    geo = pretrain(args.scenes, args.iters)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(geo, f)
    print(f"saved pretrained geometry decoder -> {args.out}")


if __name__ == "__main__":
    main()
