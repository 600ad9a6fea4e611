"""Final mesh extraction: re-render the trajectory through the trained map,
TSDF-fuse the renders, extract a mesh, optionally evaluate reconstruction.

Equivalent of reference src/tools/get_mesh_tsdf_fusion.py:111-318 (render
every Nth frame through the neural point cloud at the estimated poses,
ScalableTSDFVolume voxel 5/512 trunc 0.04, marching cubes, then eval_recon)
using this framework's renderer, TSDF (ops/tsdf.py), and marching
tetrahedra.

Library API: mesh_from_slam(slam, every=5) -> (verts, faces, colors)
CLI: python -m loopy_slam_tpu.tools.get_mesh_tsdf_fusion <cfg> --output DIR
     [--no_eval] [--gt_mesh PLY]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

from ..ops import tsdf
from ..utils.io import write_ply_mesh


def mesh_from_renders(renders, poses, cam, voxel=5.0 / 512.0, trunc=0.04,
                      depth_trunc=30.0):
    """renders: list of (color HxWx3, depth HxW) numpy pairs."""
    grid = tsdf.fuse_frames(renders, poses, cam["fx"], cam["fy"],
                            cam["cx"], cam["cy"], voxel=voxel, trunc=trunc,
                            depth_trunc=depth_trunc)
    return tsdf.extract_mesh(grid)


def mesh_from_slam(slam, every: Optional[int] = None, voxel=None,
                   out_path: Optional[str] = None):
    """Render every Nth mapped frame through the final map and fuse."""
    every = every or slam.cfg["mapping"]["every_frame"]
    voxel = voxel or slam.cfg["meshing"].get("mesh_voxel", 5.0 / 512.0)
    renders, poses = [], []
    for idx in range(0, slam.n_img, every):
        _, color_np, depth_np, _ = slam.dataset[idx]
        rq = None
        if slam.use_dynamic_radius:
            _, rq = slam._dynamic_radius(color_np)
        depth, color = slam.render_img(slam.estimate_c2w[idx], depth_np,
                                       r_query_map=rq)
        renders.append((color.astype(np.float32), depth.astype(np.float32)))
        poses.append(slam.estimate_c2w[idx])
    cam = {"fx": slam.fx, "fy": slam.fy, "cx": slam.cx, "cy": slam.cy}
    verts, faces, colors = mesh_from_renders(renders, poses, cam, voxel=voxel)
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        write_ply_mesh(out_path, verts, faces, colors)
    return verts, faces, colors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--output", required=True)
    ap.add_argument("--gt_mesh", default=None)
    ap.add_argument("--voxel", type=float, default=None)
    ap.add_argument("--no_eval", action="store_true")
    args = ap.parse_args()

    # rebuild the SLAM state from the last checkpoint and re-render
    import glob
    import jax.numpy as jnp

    from ..config import load_config
    from ..slam import LoopySLAM
    from ..utils.io import load_checkpoint

    cfg = load_config(args.config)
    cfg["data"]["output"] = args.output
    ckpts = sorted(glob.glob(os.path.join(args.output, "ckpts", "*.pkl")))
    ck = load_checkpoint(ckpts[-1])
    slam = LoopySLAM(cfg, output=args.output)
    slam.params = ck["params"]
    slam.estimate_c2w = ck["estimate_c2w_list"]
    n = ck["map"]["count"]
    from ..mapping.point_cloud import MapState
    from ..ops import knn

    cap = max(slam.mopts_map.capacity,
              int(2 ** np.ceil(np.log2(max(n, 2)))))
    pos = jnp.zeros((cap, 3)).at[:n].set(jnp.asarray(ck["map"]["pos"]))
    feat = jnp.zeros((cap, ck["map"]["geo"].shape[1]
                      + ck["map"]["col"].shape[1])).at[:n].set(
        jnp.asarray(np.concatenate([ck["map"]["geo"], ck["map"]["col"]],
                                   axis=1)))
    grid = knn.build_adaptive(pos, jnp.arange(cap) < n,
                              slam.mopts_map.cell_size,
                              slam.mopts_map.table_size,
                              slam.mopts_map.max_per_cell)
    slam.map_state = slam.map_state._replace(
        pos=pos, feat=feat, count=jnp.asarray(n, jnp.int32),
        grid=grid)

    out_path = os.path.join(args.output, "mesh", "final_mesh.ply")
    verts, faces, colors = mesh_from_slam(slam, voxel=args.voxel,
                                          out_path=out_path)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces -> {out_path}")
    if args.gt_mesh and not args.no_eval:
        from .eval_recon import calc_3d_metric
        from ..utils.io import read_ply_mesh

        gt = read_ply_mesh(args.gt_mesh)
        print(calc_3d_metric((verts, faces), gt[:2]))


if __name__ == "__main__":
    main()
