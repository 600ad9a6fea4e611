import jax
import jax.numpy as jnp
import numpy as np

from conftest import small_cfg
from loopy_slam_tpu.mapping.point_cloud import MapOptions, add_points, init_map
from loopy_slam_tpu.models.decoder import init_decoders, trainable_mask
from loopy_slam_tpu.models.renderer import RenderOptions, render_batch_ray


def build_scene(rng, cfg):
    opts = MapOptions.from_cfg(cfg)
    state = init_map(opts)
    # flat wall at z = -2, camera at origin looking down -z
    n = 2000
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = rng.uniform(-1, 1, n).astype(np.float32)
    rays_o = np.zeros((n, 3), np.float32)
    rays_d = np.stack([x, y, -np.ones(n, np.float32)], -1)
    depth = np.full(n, 2.0, np.float32)
    color = rng.uniform(size=(n, 3)).astype(np.float32)
    state, _ = add_points(state, opts, jax.random.PRNGKey(0),
                          jnp.asarray(rays_o), jnp.asarray(rays_d),
                          jnp.asarray(depth), jnp.asarray(color),
                          jnp.ones(n, bool))
    return state, opts


def test_render_shapes_and_masks(rng, cfg):
    state, mopts = build_scene(rng, cfg)
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    ropts = RenderOptions.from_cfg(cfg)
    R = 64
    x = rng.uniform(-0.5, 0.5, R).astype(np.float32)
    y = rng.uniform(-0.5, 0.5, R).astype(np.float32)
    rays_o = jnp.zeros((R, 3))
    rays_d = jnp.asarray(np.stack([x, y, -np.ones(R, np.float32)], -1))
    gt_depth = jnp.full((R,), 2.0)
    depth, var, color, valid = render_batch_ray(
        params, state.pos, state.grid, state.feat,
        rays_o, rays_d, gt_depth, jnp.ones(R, bool),
        jax.random.PRNGKey(2), ropts, "color")
    assert depth.shape == (R,) and color.shape == (R, 3) and var.shape == (R,)
    assert np.asarray(valid).mean() > 0.9  # rays point at the wall
    d = np.asarray(depth)
    assert (d > 1.8).all() and (d < 2.2).all()  # samples span [0.98d, 1.02d]
    c = np.asarray(color)
    assert (c >= 0).all() and (c <= 1).all()


def test_far_rays_are_invalid(rng, cfg):
    state, mopts = build_scene(rng, cfg)
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    ropts = RenderOptions.from_cfg(cfg)
    R = 16
    rays_o = jnp.full((R, 3), 50.0)  # far away from the map
    rays_d = jnp.asarray(np.tile([0, 0, -1.0], (R, 1)).astype(np.float32))
    gt_depth = jnp.full((R,), 2.0)
    _, _, _, valid = render_batch_ray(
        params, state.pos, state.grid, state.feat,
        rays_o, rays_d, gt_depth, jnp.ones(R, bool),
        jax.random.PRNGKey(2), ropts, "color")
    assert not np.asarray(valid).any()


def test_gradients_flow_to_pose_and_features(rng, cfg):
    from loopy_slam_tpu.ops.camera import c2w_from_tensor
    from loopy_slam_tpu.ops.camera import rays_from_uv

    state, mopts = build_scene(rng, cfg)
    params = init_decoders(jax.random.PRNGKey(1), cfg)
    ropts = RenderOptions.from_cfg(cfg)
    cam7 = jnp.asarray([1.0, 0.001, 0.001, 0.001, 0.01, 0.01, 0.01])
    i = jnp.asarray(rng.uniform(10, 70, 64).astype(np.float32))
    j = jnp.asarray(rng.uniform(10, 50, 64).astype(np.float32))

    def loss_pose(cam7):
        c2w = c2w_from_tensor(cam7)
        ro, rd = rays_from_uv(i, j, c2w, 60.0, 60.0, 39.5, 29.5)
        gt = jnp.full((64,), 2.0)
        d, v, c, _ = render_batch_ray(params, state.pos, state.grid,
                                      state.feat, ro, rd, gt,
                                      jnp.ones(64, bool),
                                      jax.random.PRNGKey(3), ropts, "color")
        return jnp.sum(jnp.abs(gt - d)) + jnp.sum(c)

    g = jax.grad(loss_pose)(cam7)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    def loss_feats(feat):
        ro = jnp.zeros((32, 3))
        rd = jnp.asarray(np.stack([rng.uniform(-0.3, 0.3, 32),
                                   rng.uniform(-0.3, 0.3, 32),
                                   -np.ones(32)], -1).astype(np.float32))
        gt = jnp.full((32,), 2.0)
        d, v, c, _ = render_batch_ray(params, state.pos, state.grid,
                                      feat, ro, rd, gt,
                                      jnp.ones(32, bool),
                                      jax.random.PRNGKey(4), ropts, "color")
        return jnp.sum(jnp.abs(gt - d)) + jnp.sum(c)

    gf = jax.grad(loss_feats)(state.feat)
    cdim = gf.shape[1] // 2
    assert float(jnp.abs(gf[:, :cdim]).sum()) > 0   # geometry half
    assert float(jnp.abs(gf[:, cdim:]).sum()) > 0   # color half


def test_trainable_mask_freezes_geo_trunk(cfg):
    params = init_decoders(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg)
    assert float(mask["geo"]["lin"][0]["w"].sum()) == 0  # frozen trunk
    assert float(mask["geo"]["B"].sum()) > 0             # embedder trains
    assert float(mask["col"]["B"].sum()) == 0            # fixed buffer
    assert float(mask["col"]["lin"][0]["w"].sum()) > 0   # color trains
