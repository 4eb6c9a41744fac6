"""Profiling & step-time tracking — first-class in the TPU build.

The reference has no tracing at all (SURVEY §5: only tqdm bars). Here:
- ``StepTimer`` keeps an EMA of step wall-time and imgs/sec, logged with the
  regular print-freq lines;
- ``trace`` context manager captures a jax.profiler trace (TensorBoard
  'profile' plugin format) into the experiment dir, gated by config/env so
  production runs pay nothing.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("base")


class StepTimer:
    """EMA step-time tracker. Call tick() once per optimizer step."""

    def __init__(self, ema=0.95):
        self.ema = ema
        self._last = None
        self.avg_s = None

    def tick(self, n_steps: int = 1):
        """Record that n_steps optimizer steps completed since the last call
        (n_steps>1 for fused multi-step dispatches)."""
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) / max(1, n_steps)
            self.avg_s = (
                dt if self.avg_s is None
                else self.ema * self.avg_s + (1 - self.ema) * dt
            )
        self._last = now

    def stats(self, batch_size=None):
        if self.avg_s is None:
            return {}
        out = {"step_time_ms": self.avg_s * 1e3}
        if batch_size:
            out["imgs_per_sec"] = batch_size / self.avg_s
        return out


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a device trace: view with TensorBoard's profile plugin."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    logger.info("profiler trace started -> %s", log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written -> %s", log_dir)
