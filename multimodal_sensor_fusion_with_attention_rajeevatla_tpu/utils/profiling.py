"""Profiling + performance observability.

The reference's only perf observability is a wall-clock latency probe
(``src/eval.py:166-228``) and TensorBoard scalars. TPU-native equivalents:

- ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (op-level timeline, HBM, MXU util).
- ``Timer`` / ``throughput`` helpers with explicit device fencing: on remote
  backends ``block_until_ready`` can return before execution completes, so
  honest timing must end in a device->host read (see ``bench.py``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(value) -> float:
    """Force completion of ``value``'s computation; returns a host float."""
    return float(jnp.sum(jax.tree_util.tree_leaves(value)[0]))


class Timer:
    """Wall-clock timer with device fencing between laps."""

    def __init__(self):
        self.laps: list = []

    @contextlib.contextmanager
    def lap(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.laps.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.laps) if self.laps else float("nan")

    @property
    def median(self) -> float:
        return float(np.median(self.laps)) if self.laps else float("nan")


def throughput(
    fn: Callable,
    *args,
    items_per_call: int = 1,
    iters: int = 10,
    warmup: int = 2,
) -> dict:
    """Measure fenced items/sec of a jitted function."""
    for _ in range(warmup):
        fence(fn(*args))
    timer = Timer()
    for _ in range(iters):
        with timer.lap():
            fence(fn(*args))
    return {
        "items_per_sec": items_per_call / timer.best,
        "best_ms": timer.best * 1000,
        "median_ms": timer.median * 1000,
    }
