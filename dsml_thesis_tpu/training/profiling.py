"""Profiling & observability hooks.

Replaces the reference's tracing/telemetry (SURVEY.md §5):
  - CUDACallback per-epoch seconds + peak memory (main.py:404-424) ->
    device_memory_stats() (the trainer times epochs inline)
  - Lightning profiler summary (main.py:753) -> jax.profiler traces viewable
    in TensorBoard/Perfetto via StepProfiler
"""
from __future__ import annotations

from typing import Dict

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


class StepProfiler:
    """Profile a window of EXACTLY num_steps dispatched train steps.

    Calling convention (training/trainer.py): `maybe_start(k)` immediately
    BEFORE dispatching step k; `maybe_stop(k)` immediately AFTER dispatching
    step k. The captured window is start_step <= k < start_step + num_steps
    — dividing the trace's device time by num_steps is per-step-exact.

    A run that RESUMES past start_step starts the window at its first
    dispatched step rather than silently never tracing (>=, not ==); once
    the window closes it never re-opens.
    """

    def __init__(self, logdir: str, start_step: int, num_steps: int = 5):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self.num_steps = num_steps
        self._active = False
        self._done = False

    def maybe_start(self, step: int):
        """`step` = the step index about to be dispatched. The window opens
        at the first dispatched step >= start_step (so a run resumed past
        start_step still profiles) and always spans num_steps from there."""
        if not self._active and not self._done and step >= self.start_step:
            self.stop_step = step + self.num_steps
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        """`step` = the step index that was just dispatched; the trace closes
        after the (num_steps)-th dispatched step, exclusive of step+1."""
        if self._active and step + 1 >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def ensure_stopped(self):
        """Finalize the trace if the loop exited (break/exception) inside the
        profiled window — otherwise the file is never written and a later
        start_trace raises 'profiler already started'."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
