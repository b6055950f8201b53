"""Profiling & observability hooks.

Replaces the reference's tracing/telemetry (SURVEY.md §5):
  - CUDACallback per-epoch seconds + peak memory (main.py:404-424) ->
    device_memory_stats() + EpochTimer
  - Lightning profiler summary (main.py:753) -> jax.profiler traces viewable
    in TensorBoard/Perfetto via trace() / StepProfiler
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def device_memory_stats() -> Dict[str, float]:
    """Peak/current HBM usage in MiB per local device (0s if unsupported)."""
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[f"{d.platform}_{d.id}_peak_mib"] = (
            stats.get("peak_bytes_in_use", 0) / 2**20
        )
        out[f"{d.platform}_{d.id}_in_use_mib"] = (
            stats.get("bytes_in_use", 0) / 2**20
        )
    return out


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EpochTimer:
    """Per-epoch wall time + peak memory, like the reference's CUDACallback."""

    def __init__(self):
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self) -> Dict[str, float]:
        dt = time.time() - (self._t0 or time.time())
        stats = {"epoch_seconds": dt}
        stats.update(device_memory_stats())
        return stats


class StepProfiler:
    """Profile a window of steps (start_step <= step < stop_step)."""

    def __init__(self, logdir: str, start_step: int, num_steps: int = 5):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int):
        if not self._active and step == self.start_step:
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False

    def ensure_stopped(self):
        """Finalize the trace if the loop exited (break/exception) inside the
        profiled window — otherwise the file is never written and a later
        start_trace raises 'profiler already started'."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
