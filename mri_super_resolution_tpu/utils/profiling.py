"""Profiling and throughput accounting.

The reference has no tracing/profiling at all (SURVEY.md section 5) — progress
came from tqdm prints. Here:
- ``Throughput``   — voxels/sec counters (the BASELINE.json north-star metric).
- ``trace``        — context manager around ``jax.profiler`` for TPU traces.
- ``time_jitted``  — robust wall-clock timing of a jitted function with
  compile-excluded warmup and ``block_until_ready`` fencing.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable

import jax


@dataclasses.dataclass
class Throughput:
    """Accumulates (items, seconds) and reports items/sec."""

    items: float = 0.0
    seconds: float = 0.0

    def add(self, items: float, seconds: float) -> None:
        self.items += items
        self.seconds += seconds

    @property
    def per_sec(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace if a logdir is given, else no-op."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


def time_jitted(fn: Callable[[], Any], repeats: int = 3, warmup: int = 1) -> float:
    """Median wall-clock seconds of ``fn()`` with device fencing.

    ``fn`` must return a pytree of jax arrays. The fence is ``jax.device_get``
    (host transfer), NOT ``block_until_ready``: on the tunnelled "axon" TPU
    backend in this environment block_until_ready returns early, yielding
    wildly inflated throughput (observed 100x). A host copy cannot complete
    before the computation has.
    """
    for _ in range(warmup):
        jax.device_get(fn())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
