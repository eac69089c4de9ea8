"""Tracing / profiling / debugging hooks (SURVEY.md §5).

The reference's observability is hand-rolled wall-clock pairs (per-image
inference times via --times, per-epoch durations). This module adds the
TPU-native layer on top while the loops keep those file contracts:

- ``profile_trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (use --profile-dir on the train /
  test_ensemble CLIs).
- ``StepTimer``: lightweight per-step wall-clock aggregation with
  percentile summary.
- ``enable_nan_debugging``: flips jax_debug_nans so the first NaN-producing
  op faults loudly (the functional-purity answer to race detectors).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Accumulates per-step durations; summary gives mean/p50/p95."""

    def __init__(self):
        self.durations: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        if not self.durations:
            return {"count": 0}
        ds = sorted(self.durations)
        n = len(ds)
        return {
            "count": n,
            "mean_s": sum(ds) / n,
            "p50_s": ds[n // 2],
            "p95_s": ds[min(n - 1, int(0.95 * n))],
            "total_s": sum(ds),
        }
