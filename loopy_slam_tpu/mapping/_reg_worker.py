"""Spawn-pool worker entry for submap registration.

Lives in its own module so a spawned worker process imports ONLY
numpy/scipy (via ops.registration) — loop_closure.py pulls in jax and
cv2 at module level, which costs each spawned interpreter ~a minute of
import time on a small host. Registration itself is pure numpy/scipy
(reference runs it in a multiprocessing pool too,
/root/reference/src/common.py:430-470).
"""

import numpy as np

from ..ops import registration as reg


def register_one(args):
    s, t, s_seg, t_seg, method, global_iter, conf, seed = args
    return reg.register_point_cloud_pair(
        s, t, s_seg, t_seg, method, global_iter, conf,
        rng=np.random.default_rng(seed))
