"""Render-vs-ground-truth visualization dumps.

Equivalent of reference src/utils/Visualizer.py:32-172:
  vis_value_only -> render the frame and return (depth, color), used for
    per-segment dumps and eval re-rendering (the actual workhorse);
  vis -> six-panel residual figure (gt/render/residual for depth+color),
    written under <output>/tracking_vis or mapping_vis.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Visualizer:
    def __init__(self, freq: int, vis_dir: str, slam, verbose=True):
        self.freq = max(int(freq), 1)
        self.vis_dir = vis_dir
        self.slam = slam
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def vis_value_only(self, c2w, gt_depth, r_query_map=None):
        """Full-frame render through the current map (no figure)."""
        return self.slam.render_img(c2w, gt_depth, r_query_map=r_query_map)

    def vis(self, idx: int, iter_: int, gt_depth, gt_color, c2w,
            r_query_map=None, freq_override: bool = False,
            save_rendered_image: bool = False):
        # gating parity with reference Visualizer.vis:86-91 (idx > 0 and
        # idx % freq == 0, or explicit override)
        if not freq_override and (idx == 0 or idx % self.freq != 0):
            return None
        depth, color = self.vis_value_only(c2w, gt_depth,
                                           r_query_map=r_query_map)
        gt_depth = np.asarray(gt_depth)
        gt_color = np.asarray(gt_color)
        depth_residual = np.abs(gt_depth - depth) * (gt_depth > 0)
        color_residual = np.abs(gt_color - color).mean(-1) * (
            gt_depth > 0)[..., None].squeeze(-1)

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        vmax = max(float(gt_depth.max()), 1e-6)
        for ax, img, title, kw in [
            (axs[0, 0], gt_depth, "input depth", dict(cmap="plasma", vmin=0, vmax=vmax)),
            (axs[0, 1], depth, "rendered depth", dict(cmap="plasma", vmin=0, vmax=vmax)),
            (axs[0, 2], depth_residual, "depth residual", dict(cmap="plasma", vmin=0, vmax=vmax * 0.2)),
            (axs[1, 0], gt_color, "input rgb", {}),
            (axs[1, 1], np.clip(color, 0, 1), "rendered rgb", {}),
            (axs[1, 2], color_residual, "rgb residual", dict(cmap="plasma", vmin=0, vmax=0.5)),
        ]:
            ax.imshow(img, **kw)
            ax.set_title(title, fontsize=9)
            ax.axis("off")
        fig.tight_layout()
        path = os.path.join(self.vis_dir, f"{idx:05d}_{iter_:04d}.jpg")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        if save_rendered_image:
            np.save(os.path.join(self.vis_dir, f"color_{idx:05d}.npy"),
                    np.clip(color, 0, 1))
            np.save(os.path.join(self.vis_dir, f"depth_{idx:05d}.npy"),
                    depth)
        if self.verbose:
            print(f"saved visualization {path}")
        return depth, color
