"""Interactive WebGL viewer export: the self-contained HTML must embed a
decodable scene payload from a run checkpoint (counterpart of the
reference's Open3D live viewer, src/tools/viz.py:45-252, for a
display-less environment)."""

import base64
import json
import os
import re

import numpy as np

from loopy_slam_tpu.tools.viz_html import export_html
from loopy_slam_tpu.utils.io import save_checkpoint


def test_export_html_payload(tmp_path):
    n = 12
    est = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    est[:, 0, 3] = np.linspace(0, 1, n)
    gt = est.copy()
    gt[:, 0, 3] += 0.01
    out = tmp_path / "run"
    os.makedirs(out / "ckpts")
    save_checkpoint(str(out / "ckpts" / "00011.pkl"), {
        "idx": n - 1, "estimate_c2w_list": est, "gt_c2w_list": gt,
        "map": {"pos": np.random.default_rng(0).normal(
            size=(500, 3)).astype(np.float32)},
    })
    # PGO snapshot enables the toggle
    save_checkpoint(str(out / "ckpts" / "00002_before_pgo.pkl"),
                    {"estimate_c2w_list": est + 0.05})

    path = export_html(str(out), max_points=300)
    html = open(path).read()
    d = json.loads(re.search(r"const D = (\{.*?\});\n", html,
                             re.S).group(1))
    assert d["n_frames"] == n and d["n_pts"] == 300  # subsampled
    pts = np.frombuffer(base64.b64decode(d["pts"]), np.float32)
    cams = np.frombuffer(base64.b64decode(d["cams"]), np.float32)
    assert pts.shape[0] == 300 * 3 and cams.shape[0] == n * 9
    assert d["before"] is not None
    est_dec = np.frombuffer(base64.b64decode(d["est"]),
                            np.float32).reshape(n, 3)
    np.testing.assert_allclose(est_dec[:, 0], np.linspace(0, 1, n),
                               rtol=1e-6)
    # self-contained: no external resources
    assert "http://" not in html and "https://" not in html
