"""Profiling / tracing — first-class, unlike the reference (SURVEY §5.1:
the reference has only tqdm progress bars).

Two tools:

* :class:`StepTimer` — cheap wall-clock accounting per train step with
  rolling throughput (steps/s, imgs/s), printed into the status line,
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable XPlane trace for any region (train steps, AttFind
  sweeps), so kernel-level time goes to the profiler UI instead of guesses.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Iterator, Optional

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    def __init__(self, window: int = 50):
        self.durations: deque = deque(maxlen=window)
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean_step_s(self) -> float:
        return sum(self.durations) / len(self.durations) if self.durations else 0.0

    def stats(self, images_per_step: int = 0) -> Dict[str, float]:
        mean = self.mean_step_s
        out = {"step_time_s": mean, "steps_per_sec": (1.0 / mean) if mean else 0.0}
        if images_per_step and mean:
            out["imgs_per_sec"] = images_per_step / mean
        return out


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with trace('/tmp/profile'):`` — no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
