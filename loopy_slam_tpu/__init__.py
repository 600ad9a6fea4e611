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
