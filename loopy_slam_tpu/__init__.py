"""loopy_slam_tpu — a TPU-native dense neural RGBD SLAM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of Loopy-SLAM
(CVPR 2024; reference layout documented in SURVEY.md). The reference is a
multi-process CUDA/PyTorch system (tracker process + mapper process + a
point-cloud RPC server, cf. reference src/Point_SLAM.py:37-252); this
framework collapses all of it into a single JAX program operating on
fixed-capacity HBM arrays, with jit-compiled tracking/mapping optimization
loops and a spatial-hash k-NN replacing faiss.

Subpackages:
  ops       pure math kernels: camera, sampling, compositing, k-NN, images
  models    neural point decoders (geometry/color MLPs, Fourier embedders)
  mapping   point-cloud map state, tracker step, mapper step, keyframes
  parallel  device-mesh sharding (pjit/shard_map) for multi-chip scale-out
  utils     datasets, config, logging, metrics
  tools     evaluation CLIs (ATE, reconstruction, rendering metrics)
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at a repo-local directory.

    The SLAM session compiles a handful of large programs (the staged
    mapping optimizer, the tracking loop, insertion variants); on the
    remote TPU backend first-compiles cost minutes and dominated bench
    wall-clock (BASELINE.md round-2: 201 s first-map + 149 s final-frame
    of a 453 s run). Executable serialization works on this backend, so a
    warm cache turns those into millisecond loads. The cache lives inside
    the repo (not /tmp) so it survives across sessions; JAX's env var
    still wins if the user set one.
    """
    import os

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERY compiled program, not just those that took >= 1 s
        # to compile: on the remote-compile TPU backend a SLAM session
        # dispatches ~100+ small eager helper ops (broadcasts, RNG splits,
        # dtype converts) at ~0.4-0.7 s of remote compile EACH, and JAX's
        # default min_compile_time_secs=1.0 refuses to cache any of them —
        # measured ~60 s of unavoidable per-run compile tax (round-4 probe:
        # 114 sub-threshold misses in a 6-frame bench run).
        if os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS") is None:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, ImportError):  # read-only install dir etc.
        pass


_enable_persistent_compile_cache()
