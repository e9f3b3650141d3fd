"""Profiling + step-time metering.

The reference has no tracing (SURVEY §5 — only tqdm throttling). Here:
``trace()`` wraps jax.profiler for TensorBoard-viewable device traces, and
``StepTimer`` produces the imgs/sec-per-chip numbers the benchmark/BASELINE
metric requires.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + imgs/sec/chip meter.

    Call ``tick()`` once per completed (blocked-on) step. Warmup steps are
    excluded so compile time never pollutes the rate.
    """

    def __init__(self, global_batch_size: int, warmup_steps: int = 2):
        self.global_batch_size = global_batch_size
        self.warmup = warmup_steps
        self.n_chips = jax.device_count()
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self) -> Optional[dict]:
        self._count += 1
        if self._count <= self.warmup:
            self._t0 = time.perf_counter()
            return None
        steps = self._count - self.warmup
        dt = time.perf_counter() - self._t0
        if dt <= 0:
            return None
        sps = steps / dt
        return {
            "steps_per_sec": sps,
            "imgs_per_sec": sps * self.global_batch_size,
            "imgs_per_sec_per_chip": sps * self.global_batch_size / self.n_chips,
        }
