"""Run-safety hardening: output-dir run lock, removed-config-key
rejection, prefetch failure propagation, and the tracking health gate's
reject-streak escape hatch (round-5 items; BASELINE.md round-4
"process-management slip" and ADVICE r4)."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import small_cfg


def test_run_lock_rejects_second_session(tmp_path):
    from loopy_slam_tpu.slam import LoopySLAM

    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "locked")
    slam1 = LoopySLAM(copy.deepcopy(cfg), output=cfg["data"]["output"])
    with pytest.raises(RuntimeError, match="already in use"):
        LoopySLAM(copy.deepcopy(cfg), output=cfg["data"]["output"])
    # a different output is fine
    slam2 = LoopySLAM(copy.deepcopy(cfg), output=str(tmp_path / "other"))
    assert slam1.output != slam2.output


def test_removed_config_key_fails_loudly(tmp_path):
    from loopy_slam_tpu.config import load_config

    p = tmp_path / "stale.yaml"
    p.write_text("mapping:\n  pool_unique: 16\n")
    with pytest.raises(ValueError, match="pool_unique"):
        load_config(str(p))


def test_prefetch_producer_failure_propagates(tmp_path):
    """A corrupt/missing frame must fail the run at the consumer with the
    original error chained — not silently kill the daemon producer thread
    and deadlock the run loop (ADVICE r4 medium)."""
    from loopy_slam_tpu.slam import LoopySLAM

    cfg = small_cfg()
    cfg["data"]["output"] = str(tmp_path / "run")
    slam = LoopySLAM(cfg, output=cfg["data"]["output"])

    class _Corrupt:
        def __init__(self, ds):
            self._ds = ds

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            if i == 3:
                raise IOError("simulated corrupt frame 3")
            return self._ds[i]

    slam.dataset = _Corrupt(slam.dataset)
    with pytest.raises(RuntimeError, match="frame 3 failed to load"):
        slam.run()


def _health_opts(cfg, **kw):
    from loopy_slam_tpu.mapping import tracker as tracker_mod

    return tracker_mod.TrackOptions.from_cfg(cfg)._replace(
        pixels=64, iters=2,
        H=cfg["cam"]["H"], W=cfg["cam"]["W"],
        fx=cfg["cam"]["fx"], fy=cfg["cam"]["fy"],
        cx=cfg["cam"]["cx"], cy=cfg["cam"]["cy"], **kw)


def test_health_streak_escape_reseeds_ema(cfg):
    """After health_streak consecutive loss-rejects with healthy support,
    the gate accepts the pose and re-seeds the EMA at the new loss level
    (ADVICE r4: a frozen EMA must not cause an unrecoverable reject
    spiral on a legitimate sustained loss shift)."""
    from loopy_slam_tpu.mapping.tracker import _apply_health_gate

    opts = _health_opts(cfg, health_gate=4.0, health_freeze=1.5,
                        health_streak=3)
    cam_init = jnp.arange(7, dtype=jnp.float32)
    cam_best = cam_init + 1.0

    health = jnp.asarray([1.0, 0.0, 0.0])  # ema=1, shifted loss = 10x
    for i in range(2):  # first two rejects: pose pinned, EMA frozen
        out, health = _apply_health_gate(
            health, jnp.asarray(10.0 * 64.0), jnp.asarray(64.0),
            cam_init, cam_best, opts)
        h = np.asarray(health)
        np.testing.assert_allclose(np.asarray(out), np.asarray(cam_init))
        assert h[0] == 1.0 and h[1] == i + 1 and h[2] == i + 1

    # third consecutive reject triggers the escape: pose accepted, EMA
    # re-seeded to the frame's mean loss, streak cleared
    out, health = _apply_health_gate(
        health, jnp.asarray(10.0 * 64.0), jnp.asarray(64.0),
        cam_init, cam_best, opts)
    h = np.asarray(health)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cam_best))
    np.testing.assert_allclose(h[0], 10.0)
    assert h[1] == 2 and h[2] == 0


def test_health_streak_no_escape_on_support_collapse(cfg):
    """Support-collapse rejects (mask support < 5% of rays) never escape
    AND never advance the streak: that optimum is unconstrained noise,
    not a shifted world — and N-1 collapse frames followed by one
    photometrically-wrong convergence must NOT fire the hatch."""
    from loopy_slam_tpu.mapping.tracker import _apply_health_gate

    opts = _health_opts(cfg, health_gate=4.0, health_freeze=1.5,
                        health_streak=2)
    cam_init = jnp.zeros((7,))
    cam_best = jnp.ones((7,))
    health = jnp.asarray([1.0, 0.0, 0.0])
    for i in range(4):  # n_mask=1 of 64 rays -> support collapse
        out, health = _apply_health_gate(
            health, jnp.asarray(10.0), jnp.asarray(1.0),
            cam_init, cam_best, opts)
        h = np.asarray(health)
        np.testing.assert_allclose(np.asarray(out), np.asarray(cam_init))
        assert h[1] == i + 1  # rejects keep accumulating
        assert h[2] == 0      # ...but the loss-reject streak does not
    # a loss-reject right after the collapse run starts the streak at 1
    # and (health_streak=2) must NOT escape yet: pose pinned, EMA frozen
    out, health = _apply_health_gate(
        health, jnp.asarray(10.0 * 64.0), jnp.asarray(64.0),
        cam_init, cam_best, opts)
    h = np.asarray(health)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cam_init))
    assert h[0] == 1.0 and h[2] == 1


def test_health_vector_backward_compat(cfg):
    """A pre-streak (2,) health vector is accepted and padded; the
    returned vector is (3,)."""
    from loopy_slam_tpu.mapping.tracker import _apply_health_gate

    opts = _health_opts(cfg, health_gate=4.0, health_streak=10)
    out, health = _apply_health_gate(
        jnp.asarray([1.0, 0.0]), jnp.asarray(64.0), jnp.asarray(64.0),
        jnp.zeros((7,)), jnp.ones((7,)), opts)
    assert health.shape == (3,)
    h = np.asarray(health)
    assert h[1] == 0 and h[2] == 0  # healthy frame accepted
    np.testing.assert_allclose(np.asarray(out), np.ones((7,)))
