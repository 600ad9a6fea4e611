"""3-D / 2-D mesh reconstruction metrics.

Equivalent of reference src/tools/eval_recon.py:19-256 without
open3d/trimesh:
  accuracy (cm):        mean nearest-neighbor distance rec->gt over 200k
                        surface samples                  (:26-30, :89-115)
  completion (cm):      mean nn distance gt->rec          (:33-37)
  completion ratio (%): fraction of gt samples within 5cm (:19-23)
  precision/recall/F-score at 1cm (the external evaluate_3d_reconstruction
                        of the reference, :12,246-247)
  depth L1 (cm):        |rendered depth(rec) - rendered depth(gt)| over
                        virtual views                     (:138-220)

The 2-D metric renders depth via point-splat z-buffers (ops/raster.py)
from perturbed estimated-trajectory viewpoints instead of the reference's
rejection-sampled random views + Open3D offscreen rasterizer; unseen-region
handling is inherited from comparing against the gt mesh's own render.
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import numpy as np
from scipy.spatial import cKDTree

from ..ops.raster import render_depth_points, sample_mesh_surface
from ..utils.io import read_ply_mesh


def get_align_transformation(rec_pts, gt_pts, iters=20):
    """Coarse ICP alignment rec->gt (reference :40-58 uses o3d ICP with
    threshold 0.1)."""
    from ..ops.registration import estimate_normals, icp_point_to_plane

    gt_n = estimate_normals(gt_pts, 0.1, 30)
    T, _, _ = icp_point_to_plane(rec_pts, gt_pts, gt_n, 0.1, np.eye(4),
                                 max_iter=iters)
    return T


def calc_3d_metric(rec_mesh, gt_mesh, n_samples=200000, align=True,
                   fscore_dist=0.01, rng=None) -> Dict[str, float]:
    """rec_mesh/gt_mesh: (verts, faces) tuples. Distances in cm."""
    rng = rng or np.random.default_rng(0)
    rec_pts, _ = sample_mesh_surface(*rec_mesh[:2], n_samples, rng)
    gt_pts, _ = sample_mesh_surface(*gt_mesh[:2], n_samples, rng)
    if align:
        T = get_align_transformation(rec_pts[::20], gt_pts[::20])
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]
    t_gt = cKDTree(gt_pts)
    t_rec = cKDTree(rec_pts)
    d_rec2gt, _ = t_gt.query(rec_pts, k=1)   # accuracy / precision
    d_gt2rec, _ = t_rec.query(gt_pts, k=1)   # completion / recall
    precision = float((d_rec2gt < fscore_dist).mean())
    recall = float((d_gt2rec < fscore_dist).mean())
    f = (2 * precision * recall / (precision + recall)
         if precision + recall > 0 else 0.0)
    return {
        "accuracy": float(d_rec2gt.mean()) * 100,
        "completion": float(d_gt2rec.mean()) * 100,
        "completion ratio": float((d_gt2rec < 0.05).mean()) * 100,
        "precision": precision * 100,
        "recall": recall * 100,
        "fscore": f * 100,
    }


def calc_2d_metric(rec_mesh, gt_mesh, cam, poses, n_views=100,
                   n_surface_samples=2_000_000, rng=None) -> Dict[str, float]:
    """Depth L1 (cm) over virtual views around the trajectory."""
    import jax.numpy as jnp

    rng = rng or np.random.default_rng(0)
    H, W = cam["H"], cam["W"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    rec_pts, _ = sample_mesh_surface(*rec_mesh[:2], n_surface_samples, rng)
    gt_pts, _ = sample_mesh_surface(*gt_mesh[:2], n_surface_samples, rng)
    rec_pts = jnp.asarray(rec_pts, jnp.float32)
    gt_pts = jnp.asarray(gt_pts, jnp.float32)
    errs = []
    for _ in range(n_views):
        base = poses[rng.integers(0, len(poses))].copy()
        base[:3, 3] += rng.normal(0, 0.05, 3)
        c2w = jnp.asarray(base, jnp.float32)
        d_rec = np.asarray(render_depth_points(rec_pts, c2w, H, W,
                                               fx, fy, cx, cy))
        d_gt = np.asarray(render_depth_points(gt_pts, c2w, H, W,
                                              fx, fy, cx, cy))
        m = (d_gt > 0) & (d_rec > 0)
        if m.sum() > 100:
            errs.append(np.abs(d_rec - d_gt)[m].mean())
    return {"depth l1": float(np.mean(errs)) * 100 if errs else float("nan")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec_mesh", required=True)
    ap.add_argument("--gt_mesh", required=True)
    ap.add_argument("-3d", dest="three_d", action="store_true")
    ap.add_argument("-2d", dest="two_d", action="store_true")
    args = ap.parse_args()
    rec = read_ply_mesh(args.rec_mesh)
    gt = read_ply_mesh(args.gt_mesh)
    out = {}
    if args.three_d or not args.two_d:
        out.update(calc_3d_metric(rec, gt))
    print(out)


if __name__ == "__main__":
    main()
