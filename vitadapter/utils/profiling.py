"""Profiling / tracing utilities (SURVEY §5.1 TPU equivalent).

Replaces the reference's IterTimerHook + CUDA max-memory logging
(`detection/mmcv_custom/customized_text.py:50-61,113-116`) with JAX-native
tools: XLA profiler traces, per-step wall timing (device time ~= wall time
between real syncs under jit), and device memory stats.
"""

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            }
    return out


class StepTimer:
    """Wall-clock step timing with data-time split (reference
    CustomizedTextLoggerHook fields: time / data_time / ETA)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.data_time = 0.0
        self.steps = 0

    def data_tick(self, seconds: float):
        self.data_time += seconds

    def step(self):
        self.steps += 1

    def summary(self, total_steps_left: int) -> Dict[str, float]:
        dt = time.perf_counter() - self._t0
        per = dt / max(self.steps, 1)
        return {"time": per,
                "data_time": self.data_time / max(self.steps, 1),
                "eta_hours": per * total_steps_left / 3600.0}
