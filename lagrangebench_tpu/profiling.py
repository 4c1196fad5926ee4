"""Profiling and step-timing observability.

The reference has no in-repo tracing (SURVEY.md §5); here the trainer gets:
* a ``StepTimer`` accumulating wall-clock step statistics (mean/p50/p95,
  steps/s, particle-steps/s) reported at every log interval;
* optional XLA profiler traces via ``jax.profiler`` between two configured
  steps, written to a TensorBoard-compatible directory
  (``cfg.logging.profile_dir`` + ``profile_steps``).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    """Rolling wall-clock statistics over training steps."""

    def __init__(self, window: int = 200):
        self.window = window
        self._durations: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        """Mark the end of a step."""
        now = time.perf_counter()
        if self._last is not None:
            self._durations.append(now - self._last)
            if len(self._durations) > self.window:
                self._durations.pop(0)
        self._last = now

    def reset_clock(self) -> None:
        """Forget the last timestamp (e.g. after an eval pause)."""
        self._last = None

    def stats(self, particles_per_step: Optional[int] = None) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = np.asarray(self._durations)
        out = {
            "perf/ms_per_step": float(d.mean() * 1e3),
            "perf/ms_per_step_p50": float(np.percentile(d, 50) * 1e3),
            "perf/ms_per_step_p95": float(np.percentile(d, 95) * 1e3),
            "perf/steps_per_sec": float(1.0 / d.mean()),
        }
        if particles_per_step:
            out["perf/particle_steps_per_sec"] = float(
                particles_per_step / d.mean()
            )
        return out


class ProfilerHook:
    """Start/stop a jax profiler trace between two training steps."""

    def __init__(self, profile_dir: Optional[str], start_step: int, stop_step: int):
        self.profile_dir = profile_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.profile_dir and not self._active and step == self.start_step:
            import jax

            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.profile_dir}")
