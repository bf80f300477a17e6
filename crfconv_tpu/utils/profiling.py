"""Tracing & throughput observability.

The reference's only performance instrumentation is wall-clock prints
around epochs (trainval.py:134-145; SURVEY.md §5 "tracing: none").  Here
profiling is first-class: a ``jax.profiler`` trace context for device
timelines (viewable in XProf/TensorBoard), a ``StepTimer`` that reports
step time and points/sec with warmup exclusion, and an epoch-level meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/crfconv_trace") -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: call tick(points) once per step."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.reset()

    def reset(self):
        self._steps = 0
        self._points = 0
        self._t0: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, points: int = 0):
        now = time.perf_counter()
        self._steps += 1
        if self._steps == self.warmup:
            self._t0 = now
            self._points = 0
        elif self._steps > self.warmup:
            self._points += points
        self._last = now

    @property
    def measured_steps(self) -> int:
        return max(self._steps - self.warmup, 0)

    @property
    def seconds(self) -> float:
        if self._t0 is None or self._last is None:
            return 0.0
        return self._last - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.measured_steps / self.seconds if self.seconds > 0 else 0.0

    @property
    def points_per_sec(self) -> float:
        return self._points / self.seconds if self.seconds > 0 else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.measured_steps,
            "seconds": round(self.seconds, 3),
            "steps_per_sec": round(self.steps_per_sec, 3),
            "points_per_sec": round(self.points_per_sec, 1),
        }
