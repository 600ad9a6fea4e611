"""Dense TSDF fusion + surface extraction (marching tetrahedra).

Replaces Open3D's ScalableTSDFVolume used by the reference for (a) the
per-submap clouds fed to loop-closure registration (reference
src/neural_point.py:959-1073: voxel 5/512, trunc 0.04, RGB, extract mesh
vertices as the registration point cloud) and (b) final mesh fusion
(src/tools/get_mesh_tsdf_fusion.py:243-288).

Conventions: the reference RE-flips the Y/Z axes of the estimated c2w
before integration (neural_point.py:987-989), i.e. the TSDF world uses
standard CV pinhole (+z forward); callers pass poses already in the
dataset's OpenGL convention and `integrate` handles the flip.

Integration is a single jittable gather/scatter over the dense grid;
surface extraction runs host-side via marching tetrahedra (each cube split
into 6 tetrahedra — no 256-case table needed, same zero-crossing surface).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFGrid(NamedTuple):
    tsdf: jnp.ndarray     # (X, Y, Z) float32, init +1
    weight: jnp.ndarray   # (X, Y, Z) float32
    color: jnp.ndarray    # (X, Y, Z, 3) float32
    origin: jnp.ndarray   # (3,) world position of voxel (0,0,0) center
    voxel: jnp.ndarray    # () float32


def init_grid(origin, dims: Tuple[int, int, int], voxel: float) -> TSDFGrid:
    X, Y, Z = dims
    return TSDFGrid(
        tsdf=jnp.ones((X, Y, Z), jnp.float32),
        weight=jnp.zeros((X, Y, Z), jnp.float32),
        color=jnp.zeros((X, Y, Z, 3), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel=jnp.asarray(voxel, jnp.float32),
    )


def grid_for_bounds(lo, hi, voxel: float,
                    fixed_dims=None) -> TSDFGrid:
    """fixed_dims pins the grid SHAPE (voxel size adapts to the bounds
    instead) so the jitted integrate compiles once across segments —
    shape-varying grids would recompile per segment on remote-compile
    runtimes."""
    lo = np.asarray(lo, np.float64) - 2 * voxel
    hi = np.asarray(hi, np.float64) + 2 * voxel
    if fixed_dims is not None:
        voxel = max(voxel, float(np.max((hi - lo) / (np.array(fixed_dims)
                                                     - 1))))
        return init_grid(lo, tuple(fixed_dims), voxel)
    dims = tuple(int(d) for d in np.ceil((hi - lo) / voxel) + 1)
    return init_grid(lo, dims, voxel)


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"),
         donate_argnames=("grid",))
def integrate(grid: TSDFGrid, depth, color, c2w, fx: float, fy: float,
              cx: float, cy: float, trunc: float = 0.04,
              depth_trunc: float = 30.0) -> TSDFGrid:
    """Fuse one RGBD frame. depth (H,W) meters, color (H,W,3) in [0,1],
    c2w 4x4 in the dataset's OpenGL convention."""
    H, W = depth.shape
    X, Y, Z = grid.tsdf.shape
    flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0]))
    c2w_cv = c2w @ flip
    w2c = jnp.linalg.inv(c2w_cv)

    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    pts = (jnp.stack([ii, jj, kk], -1).reshape(-1, 3).astype(jnp.float32)
           * grid.voxel + grid.origin)
    cam = jnp.matmul(pts, w2c[:3, :3].T, precision="highest") + w2c[:3, 3]
    z = cam[:, 2]
    u = fx * cam[:, 0] / jnp.maximum(z, 1e-6) + cx
    v = fy * cam[:, 1] / jnp.maximum(z, 1e-6) + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    d = depth[vc, uc]
    valid = inb & (d > 0) & (d < depth_trunc)
    sdf = d - z
    valid = valid & (sdf > -trunc)
    tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
    w_new = valid.astype(jnp.float32)

    w_old = grid.weight.reshape(-1)
    t_old = grid.tsdf.reshape(-1)
    c_old = grid.color.reshape(-1, 3)
    w_sum = w_old + w_new
    t = jnp.where(w_new > 0, (t_old * w_old + tsdf_new) / jnp.maximum(w_sum, 1e-6),
                  t_old)
    rgb = color[vc, uc]
    c = jnp.where((w_new > 0)[:, None],
                  (c_old * w_old[:, None] + rgb) / jnp.maximum(w_sum, 1e-6)[:, None],
                  c_old)
    return TSDFGrid(tsdf=t.reshape(X, Y, Z), weight=w_sum.reshape(X, Y, Z),
                    color=c.reshape(X, Y, Z, 3), origin=grid.origin,
                    voxel=grid.voxel)


# ---------------------------------------------------------------------------
# surface extraction (host)
# ---------------------------------------------------------------------------

# 6-tetrahedra decomposition of the unit cube (corner indices 0..7 with
# corner c = (x, y, z) bits: c = x*4 + y*2 + z).
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 7],
    [0, 5, 7, 4],
    [0, 7, 3, 2],
    [0, 7, 2, 6],
    [0, 7, 6, 4],
])
_CORNERS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)])


def extract_mesh(grid: TSDFGrid, min_weight: float = 0.0):
    """Marching tetrahedra over the fused grid -> (verts, faces, colors).

    Voxels with weight <= min_weight are treated as empty (+1) so unseen
    space produces no surface.
    """
    tsdf = np.asarray(grid.tsdf)
    weight = np.asarray(grid.weight)
    colg = np.asarray(grid.color)
    origin = np.asarray(grid.origin)
    voxel = float(grid.voxel)
    # o3d semantics: surfaces are only extracted between OBSERVED voxels —
    # unobserved (zero-weight) corners poison their cubes (otherwise the
    # truncation boundary behind surfaces generates a phantom backface)
    vol = np.where(weight > min_weight, tsdf, np.nan)
    X, Y, Z = vol.shape
    if min(X, Y, Z) < 2:
        return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                np.zeros((0, 3)))

    # native C++ marching tetrahedra when available (order of magnitude
    # faster on production-size grids), numpy otherwise
    try:
        from ..native.build import march_tets_native
        tris = march_tets_native(vol)
    except Exception:
        tris = None
    if tris is not None:
        if len(tris) == 0:
            return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                    np.zeros((0, 3)))
        return _weld(tris, colg, origin, voxel)

    # corner values for every cube, (X-1, Y-1, Z-1, 8)
    cv = np.empty((X - 1, Y - 1, Z - 1, 8), vol.dtype)
    for c, (dx, dy, dz) in enumerate(_CORNERS):
        cv[..., c] = vol[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
    base = np.stack(np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                                np.arange(Z - 1), indexing="ij"), -1)
    base = base.reshape(-1, 3).astype(np.float64)
    cv = cv.reshape(-1, 8)
    # only fully-observed cubes straddling zero matter; inside = v < 0,
    # outside = v >= 0 (an exact 0 — surface through a voxel center — must
    # count as outside, or such cubes are misclassified as single-sign)
    with np.errstate(invalid="ignore"):
        mixed = (np.isfinite(cv).all(1) & (np.nanmin(cv, 1) < 0)
                 & (np.nanmax(cv, 1) >= 0))
    cv = cv[mixed]
    base = base[mixed]

    verts_list = []
    for tet in _TETS:
        vals = cv[:, tet]                      # (M, 4)
        pos = base[:, None, :] + _CORNERS[tet][None]  # (M, 4, 3)
        inside = vals < 0
        code = (inside * np.array([1, 2, 4, 8])).sum(1)
        # edge interpolation helper
        def edge_pt(m, a, b):
            va, vb = vals[m, a], vals[m, b]
            t = va / (va - vb + 1e-12)
            return pos[m, a] + t[:, None] * (pos[m, b] - pos[m, a])

        for cs in range(1, 15):
            m = code == cs
            if not m.any():
                continue
            ins = [i for i in range(4) if cs & (1 << i)]
            outs = [i for i in range(4) if not cs & (1 << i)]
            if len(ins) == 1:
                a = ins[0]
                tri = np.stack([edge_pt(m, a, outs[0]),
                                edge_pt(m, a, outs[1]),
                                edge_pt(m, a, outs[2])], 1)
                verts_list.append(tri)
            elif len(ins) == 3:
                a = outs[0]
                tri = np.stack([edge_pt(m, ins[0], a),
                                edge_pt(m, ins[1], a),
                                edge_pt(m, ins[2], a)], 1)
                verts_list.append(tri)
            else:  # quad case: two inside, two outside -> 2 triangles
                a, b = ins
                c, d = outs
                p_ac = edge_pt(m, a, c)
                p_ad = edge_pt(m, a, d)
                p_bc = edge_pt(m, b, c)
                p_bd = edge_pt(m, b, d)
                verts_list.append(np.stack([p_ac, p_ad, p_bd], 1))
                verts_list.append(np.stack([p_ac, p_bd, p_bc], 1))
    if not verts_list:
        return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                np.zeros((0, 3)))
    tris = np.concatenate(verts_list, 0)       # (T, 3, 3) in voxel coords
    return _weld(tris, colg, origin, voxel)


def _weld(tris: np.ndarray, colg, origin, voxel):
    """Weld a triangle soup into an indexed mesh + vertex colors."""
    flat = tris.reshape(-1, 3)
    # weld duplicate vertices
    key = np.round(flat / 1e-4).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    verts_vox = np.zeros((len(uniq), 3))
    np.add.at(verts_vox, inv, flat)
    counts = np.bincount(inv).astype(np.float64)
    verts_vox /= counts[:, None]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    faces = faces[good]
    verts = verts_vox * voxel + origin
    colors = _trilinear_color(colg, verts_vox)
    return verts, faces, colors


def _trilinear_color(colg: np.ndarray, vox_coords: np.ndarray) -> np.ndarray:
    X, Y, Z, _ = colg.shape
    p = np.clip(vox_coords, 0, [X - 1.001, Y - 1.001, Z - 1.001])
    i0 = np.floor(p).astype(int)
    f = p - i0
    out = np.zeros((len(p), 3))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.abs(1 - dx - f[:, 0]) * np.abs(1 - dy - f[:, 1])
                     * np.abs(1 - dz - f[:, 2]))
                out += w[:, None] * colg[np.minimum(i0[:, 0] + dx, X - 1),
                                         np.minimum(i0[:, 1] + dy, Y - 1),
                                         np.minimum(i0[:, 2] + dz, Z - 1)]
    return np.clip(out, 0, 1)


def fuse_frames(frames, c2ws, fx, fy, cx, cy, voxel=0.02, trunc=0.04,
                bounds=None, depth_trunc=30.0, fixed_dims=None):
    """Host helper: fuse a list of (color, depth) numpy frames.

    bounds=None derives them from unprojected depth samples.
    Returns the TSDFGrid (device arrays).
    """
    if bounds is None:
        pts_all = []
        for (color, depth), c2w in zip(frames, c2ws):
            H, W = depth.shape
            step = max(1, H * W // 5000)
            jj, ii = np.unravel_index(np.arange(0, H * W, step), (H, W))
            d = depth[jj, ii]
            ok = d > 0
            dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                             -np.ones_like(d)], -1)
            pts = (dirs @ np.asarray(c2w)[:3, :3].T) * d[:, None] + \
                np.asarray(c2w)[:3, 3]
            pts_all.append(pts[ok])
        pts_all = np.concatenate(pts_all)
        bounds = (pts_all.min(0), pts_all.max(0))
    grid = grid_for_bounds(bounds[0], bounds[1], voxel,
                           fixed_dims=fixed_dims)
    trunc = max(trunc, 2.0 * float(grid.voxel))
    for (color, depth), c2w in zip(frames, c2ws):
        grid = integrate(grid, jnp.asarray(depth), jnp.asarray(color),
                         jnp.asarray(c2w, jnp.float32),
                         float(fx), float(fy), float(cx), float(cy),
                         trunc=trunc, depth_trunc=depth_trunc)
    return grid
