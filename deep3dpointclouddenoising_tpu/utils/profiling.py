"""Tracing / profiling helpers.

The reference has no profiler — only wall-clock AverageMeters
(/root/reference/u_net_arch/train_dist.py:433-463).  TPU-native plan
(SURVEY.md §5): ``jax.profiler`` device traces viewable in XProf/TensorBoard
plus a lightweight per-step host timer that distinguishes host (input
pipeline) time from device time.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step host/device timing: call ``host()`` after the input batch is
    ready and ``device(result)`` after the step; ``device`` blocks on the
    result so the device segment is the real step latency."""

    def __init__(self):
        self.host_s = 0.0
        self.device_s = 0.0
        self.steps = 0
        self._t = time.perf_counter()

    def host(self):
        now = time.perf_counter()
        self.host_s += now - self._t
        self._t = now

    def device(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.device_s += now - self._t
        self._t = now
        self.steps += 1

    def summary(self) -> Dict[str, float]:
        n = max(self.steps, 1)
        return {"host_ms_per_step": 1000.0 * self.host_s / n,
                "device_ms_per_step": 1000.0 * self.device_s / n,
                "steps": self.steps}
