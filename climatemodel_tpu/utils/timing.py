"""Profiling and throughput metrics.

The reference's only observability is tqdm bars and carriage-return prints
(SURVEY.md section 5).  Here: wall-clock throughput counters in the units the
framework optimises for (simulated model-days/s, cell-updates/s), and a thin
wrapper over jax.profiler for device traces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Throughput:
    """Accumulating throughput counter.

    >>> meter = Throughput()
    >>> with meter.measure(work=n_cells * n_steps):
    ...     out = step(state); jax.block_until_ready(out)
    >>> meter.rate
    """
    total_work: float = 0.0
    total_seconds: float = 0.0
    n_measurements: int = 0

    @contextlib.contextmanager
    def measure(self, work: float):
        t0 = time.perf_counter()
        yield
        self.total_seconds += time.perf_counter() - t0
        self.total_work += work
        self.n_measurements += 1

    @property
    def rate(self) -> float:
        return self.total_work / self.total_seconds if self.total_seconds else 0.0


def time_fn(fn, *args, repeats=3, **kwargs):
    """Best-of-N wall time of fn(*args) with device sync; returns
    (best_seconds, last_output).  The first call (compile) is excluded."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def model_days_per_second(simulated_seconds: float, wall_seconds: float) -> float:
    """Throughput in simulated model-days per wall second."""
    return simulated_seconds / 86400.0 / wall_seconds


def cell_updates_per_second(n_cells: int, n_steps: int,
                            wall_seconds: float) -> float:
    """Throughput in grid-cell updates per wall second."""
    return n_cells * n_steps / wall_seconds


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
