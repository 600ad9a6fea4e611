"""Checkpointing and point-cloud export.

Replaces the reference Logger (src/utils/Logger.py:20-68, .tar via torch)
with flat npz checkpoints, and writes PLY point clouds without external
mesh libraries (the reference used open3d, src/Mapper.py:1017-1021).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np


def write_ply_points(path: str, points: np.ndarray, colors=None):
    """Binary little-endian PLY of a point set; colors in [0,1] or uint8."""
    n = points.shape[0]
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += ["end_header", ""]
        f.write("\n".join(header).encode())
        if colors is None:
            f.write(points.astype("<f4").tobytes())
        else:
            c = colors
            if c.dtype != np.uint8:
                c = np.clip(c * (255.0 if c.max() <= 1.0 + 1e-6 else 1.0),
                            0, 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = points.T.astype(np.float32)
            rec["r"], rec["g"], rec["b"] = c.T
            f.write(rec.tobytes())


def write_ply_mesh(path: str, verts: np.ndarray, faces: np.ndarray,
                   colors=None):
    """Binary PLY triangle mesh."""
    n, m = verts.shape[0], faces.shape[0]
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {m}",
                   "property list uchar int vertex_indices", "end_header", ""]
        f.write("\n".join(header).encode())
        if colors is None:
            f.write(verts.astype("<f4").tobytes())
        else:
            c = colors
            if c.dtype != np.uint8:
                c = np.clip(c * 255.0, 0, 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("r", "u1"), ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = verts.T.astype(np.float32)
            rec["r"], rec["g"], rec["b"] = c.T
            f.write(rec.tobytes())
        frec = np.zeros(m, dtype=[("n", "u1"), ("i", "<i4", (3,))])
        frec["n"] = 3
        frec["i"] = faces.astype(np.int32)
        f.write(frec.tobytes())


def read_ply_mesh(path: str):
    """Read a binary PLY mesh written by write_ply_mesh (round-trip use)."""
    with open(path, "rb") as f:
        line = f.readline()
        n = m = 0
        has_color = False
        while True:
            line = f.readline().decode().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("element face"):
                m = int(line.split()[-1])
            elif line.startswith("property uchar red"):
                has_color = True
            elif line == "end_header":
                break
        if has_color:
            rec = np.frombuffer(f.read(n * 15), dtype=[
                ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                ("r", "u1"), ("g", "u1"), ("b", "u1")], count=n)
            verts = np.stack([rec["x"], rec["y"], rec["z"]], -1)
            colors = np.stack([rec["r"], rec["g"], rec["b"]], -1)
        else:
            verts = np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3)
            colors = None
        frec = np.frombuffer(f.read(m * 13), dtype=[("n", "u1"),
                                                    ("i", "<i4", (3,))],
                             count=m)
        return np.array(verts), np.array(frec["i"]), (
            None if colors is None else np.array(colors))


def save_checkpoint(path: str, payload: Dict[str, Any]):
    """Pickle-based checkpoint (pytrees of numpy arrays + metadata).

    Same content role as the reference .tar ckpts (Logger.py:24-60):
    trajectories, decoder params, map buffers, keyframe metadata.
    """
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
