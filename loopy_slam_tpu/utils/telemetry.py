"""Timing + experiment-tracking instrumentation.

Replaces the reference's ad-hoc mytimer/perf_counter pairs and optional
wandb logging (reference src/common.py:18-29, Mapper.py:577,737-763,
1051-1055, Tracker.py:385-390): a process-wide timer registry with
per-phase statistics, an optional JAX profiler trace, and a no-op-safe
wandb shim (the flag works whether or not wandb is installed).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class Timers:
    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for k, v in self.records.items():
            a = np.asarray(v)
            out[k] = {"n": len(v), "mean_s": float(a.mean()),
                      "median_s": float(np.median(a)),
                      "total_s": float(a.sum())}
        return out

    def report(self):
        for k, s in sorted(self.summary().items()):
            print(f"  {k:24s} n={s['n']:<5d} median {s['median_s']*1e3:8.1f} ms"
                  f"  total {s['total_s']:8.2f} s")


GLOBAL_TIMERS = Timers()


class WandbLogger:
    """No-op-safe wandb wrapper (reference logs via wandb when cfg.wandb)."""

    def __init__(self, cfg, name: str):
        self.enabled = bool(cfg.get("wandb"))
        self.run = None
        if self.enabled:
            try:
                import wandb

                self.run = wandb.init(
                    project=cfg.get("project_name", "loopy_slam_tpu"),
                    name=name, dir=cfg.get("wandb_folder", "output"),
                    config=cfg)
            except Exception as e:  # offline env or wandb missing
                print(f"wandb disabled ({type(e).__name__}); "
                      "logging to console only")
                self.enabled = False

    def log(self, payload: dict):
        if self.enabled and self.run is not None:
            self.run.log(payload)

    def finish(self):
        if self.enabled and self.run is not None:
            self.run.finish()


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """JAX profiler trace when a directory is given (view with xprof/TB)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
