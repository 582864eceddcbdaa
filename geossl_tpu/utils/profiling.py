"""Profiling / tracing utilities.

The reference's only performance signal is per-epoch wall-clock prints
(SURVEY.md §5.1). Here: ``jax.profiler`` trace capture plus a lightweight
step timer with device synchronization — enough to attribute time to
compile vs steady-state and to feed ``xprof``/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with explicit device sync; distinguishes the first
    (compile-inclusive) step from steady state."""

    def __init__(self):
        self.first_step_s: Optional[float] = None
        self.steady_s: list[float] = []

    @contextlib.contextmanager
    def step(self, sync_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            # Fence with a VALUE FETCH, not block_until_ready: on the
            # remote-TPU tunnel block_until_ready can return before queued
            # executions finish (measured 20 ms "blocked" vs 4.6 s real —
            # docs/PERF.md pitfall #1). device_get must wait for the bytes.
            jax.device_get(jax.tree_util.tree_leaves(sync_on)[:1])
        dt = time.perf_counter() - t0
        if self.first_step_s is None:
            self.first_step_s = dt
        else:
            self.steady_s.append(dt)

    def summary(self) -> dict:
        import numpy as np

        return {
            "first_step_s": self.first_step_s,
            "steady_mean_ms": 1e3 * float(np.mean(self.steady_s)) if self.steady_s else None,
            "steady_p50_ms": 1e3 * float(np.median(self.steady_s)) if self.steady_s else None,
            "steps": len(self.steady_s) + (self.first_step_s is not None),
        }
