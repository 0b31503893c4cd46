"""Profiling and step-timing utilities.

The reference's only observability is wall-clock ``AverageMeter`` prints
(`main.py:361-362,441,519-520`). On TPU, first-class tracing comes from
``jax.profiler``: ``profile_trace`` wraps a region into a TensorBoard-viewable
trace (XLA op timeline, HBM usage), and ``StepTimer`` gives steady-state
steps/sec with correct async-dispatch handling (it blocks on a device value
before reading the clock — naive timing under-reports by the dispatch depth).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace",
                  host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region.

    View with: ``tensorboard --logdir <log_dir>`` (Profile tab), or upload
    the .trace.json.gz to Perfetto.
    """
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing with device synchronization.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in loader:
    ...     out = step(batch)
    ...     timer.tick(out)           # blocks on `out` before timestamping
    >>> timer.steps_per_sec()
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None
        self._elapsed = 0.0

    def tick(self, device_value=None) -> None:
        if device_value is not None:
            jax.block_until_ready(device_value)
        now = time.perf_counter()
        self._count += 1
        if self._count == self.warmup:
            self._t0 = now
        elif self._count > self.warmup and self._t0 is not None:
            self._elapsed = now - self._t0

    @property
    def timed_steps(self) -> int:
        return max(0, self._count - self.warmup)

    def steps_per_sec(self) -> float:
        if self.timed_steps == 0 or self._elapsed <= 0:
            return 0.0
        return self.timed_steps / self._elapsed
