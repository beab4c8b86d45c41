"""Tracing / profiling utilities.

TPU-native replacement for the reference's TF-1.x ``Timeliner`` chrome-trace
wrapper (/root/reference/phi/tf/profiling.py:7-56) and the ad-hoc
``Printer.print(avg_window=...)`` wall-clock probes
(/root/reference/utils.py:46-117): a ``jax.profiler`` context that writes
Perfetto/TensorBoard traces, and a block-until-ready step timer with rolling
averages.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/diffphycon_trace",
          create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard (profile plugin) or
    Perfetto. Usage:

        with trace("/tmp/tr"):
            step(...)  # traced
    """
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling-average step timer with explicit device sync.

    timer = StepTimer(avg_window=20)
    for ...:
        out = step(...)
        dt = timer.tick(out)   # blocks on out, returns seconds since last tick
    """

    def __init__(self, avg_window: int = 20):
        self._window = deque(maxlen=avg_window)
        self._last: Optional[float] = None

    def tick(self, *sync_on) -> float:
        for x in sync_on:
            jax.block_until_ready(x)
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return 0.0
        dt = now - self._last
        self._last = now
        self._window.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._window) / len(self._window) if self._window else 0.0

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline):

        with annotate("denoise_step"): ...
    """
    return jax.profiler.TraceAnnotation(name)
