"""Tracing / profiling utilities — better than the reference's wall-clock
timers (SURVEY.md section 5 'Tracing / profiling: minimal, ad-hoc').

  * `trace(logdir)` — context manager around jax.profiler for full XLA/TPU
    traces viewable in TensorBoard/Perfetto.
  * `annotate(name)` — TraceAnnotation for custom spans inside host code.
  * `StepTimer` — rolling per-step wall clock with p50/p90 summary (the
    reference's step_time metric, training/metrics.py:168-170, upgraded).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 100) -> None:
        self.times: deque = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_p50": float(np.percentile(arr, 50)),
            "step_time_p90": float(np.percentile(arr, 90)),
            "step_time_mean": float(arr.mean()),
        }
