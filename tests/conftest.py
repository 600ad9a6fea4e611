"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere; tiny shapes keep compile times tolerable."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the image's sitecustomize pins jax_platforms to "axon,cpu"; override it so
# tests never dispatch to the tunneled TPU
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound (tiny shapes,
# many jitted programs), so repeat runs drop from ~30 min to a few minutes
_CACHE_DIR = os.environ.get(
    "LOOPY_JAX_CACHE", "/tmp/loopy_jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import copy  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from loopy_slam_tpu.config import DEFAULTS, update_recursive  # noqa: E402


def small_cfg(**overrides):
    """A tiny synthetic-scene config for fast tests."""
    cfg = copy.deepcopy(DEFAULTS)
    update_recursive(cfg, {
        "dataset": "synthetic",
        "use_dynamic_radius": False,
        "setup_seed": 1219,
        "cam": {
            "H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
            "cx": 39.5, "cy": 29.5, "png_depth_scale": 6553.5, "crop_edge": 0,
        },
        "data": {"n_frames": 12, "output": "/tmp/loopy_test_out"},
        "tracking": {
            "pixels": 200, "iters": 12, "ignore_edge_W": 4, "ignore_edge_H": 4,
            "separate_LR": True, "const_speed_assumption": True, "lr": 0.002,
        },
        "mapping": {
            "every_frame": 2, "pixels": 400, "pixels_adding": 800,
            "pixels_based_on_color_grad": 0,
            "iters": 30, "iters_first": 60, "geo_iter_first": 20,
            "mapping_window_size": 4, "keyframe_every": 2,
            "color_refine": False, "save_rendered_image": False,
        },
        "rendering": {"sample_near_pcl": False, "eval_img": False},
        "pointcloud": {
            "capacity": 2 ** 15, "cell_table_size": 2 ** 16, "max_per_cell": 24,
            "radius_add": 0.08, "radius_query": 0.16, "radius_min": 0.04,
        },
        "meshing": {"eval_rec": False},
    })
    update_recursive(cfg, overrides)
    return cfg


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked slow is the fast tier, so
    `pytest -m fast` / `pytest -m slow` partition the suite."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def cfg():
    return small_cfg()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
