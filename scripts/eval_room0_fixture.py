#!/usr/bin/env python
"""Reconstruction metrics for a Replica-format FIXTURE run.

The on-disk fixture (scripts/make_replica_fixture.py) is the procedural
box room rendered in Replica's exact format, so its ground-truth surface
is analytic (Synthetic.gt_mesh). The in-run final_eval skips the 3-D
metrics for Replica-format data (a real Replica download ships its own
GT mesh; the loader has none) — this script supplies the analytic mesh
and reproduces the same cull -> accuracy/completion/F-score ->
virtual-view depth-L1 pipeline (reference src/tools/eval_recon.py).

Usage: python scripts/eval_room0_fixture.py --output output/Replica/room0
"""

import argparse
import copy
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="output/Replica/room0")
    ap.add_argument("--every", type=int, default=5)
    ap.add_argument("--n-2d-views", type=int, default=100)
    ap.add_argument("--scene", default="v2", choices=["v2", "v3"],
                    help="scene version the fixture was generated with")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from loopy_slam_tpu.config import DEFAULTS, update_recursive
    from loopy_slam_tpu.tools.cull_mesh import cull_mesh
    from loopy_slam_tpu.tools.eval_recon import (calc_2d_metric,
                                                 calc_3d_metric)
    from loopy_slam_tpu.utils.datasets import Synthetic
    from loopy_slam_tpu.utils.io import read_ply_mesh
    from scripts.make_replica_fixture import REPLICA_CAM

    mesh_path = os.path.join(args.output, "mesh", "final_mesh.ply")
    verts, faces = read_ply_mesh(mesh_path)[:2]
    print(f"reconstructed mesh: {len(verts)} verts, {len(faces)} faces")

    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {"dataset": "synthetic",
                           "cam": dict(REPLICA_CAM),
                           "data": {"n_frames": 4, "scene": args.scene}})
    ds = Synthetic(cfg)
    gv, gf = ds.gt_mesh()

    cands = sorted(
        p for p in glob.glob(os.path.join(args.output, "ckpts", "*.pkl"))
        if "_pgo" not in os.path.basename(p))
    with open(cands[-1], "rb") as fh:
        r = pickle.load(fh)
    gt_traj = np.asarray(r["gt_c2w_list"])
    cams = [gt_traj[i] for i in range(0, len(gt_traj), args.every)]
    cam = {k: REPLICA_CAM[k] for k in ("H", "W", "fx", "fy", "cx", "cy")}
    gv, gf, _, unseen = cull_mesh(gv, gf, cams, cam, return_unseen=True)

    stats = calc_3d_metric((verts, faces), (gv, gf))
    stats.update(calc_2d_metric((verts, faces), (gv, gf),
                                n_views=args.n_2d_views, pc_unseen=unseen))
    print("reconstruction metrics:", stats)


if __name__ == "__main__":
    main()
