"""Profiling & debugging subsystem (absent in the reference — SURVEY.md §5).

* `trace(logdir)` — context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
* `Timer` — block_until_ready-based wall timing for jitted fns.
* `enable_nan_debugging()` — flips jax_debug_nans for fault isolation (the
  TPU-world equivalent of a sanitizer toggle).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Median wall time of a jitted callable (compile excluded)."""

    def __init__(self, fn: Callable, warmup: int = 1, iters: int = 10):
        self.fn, self.warmup, self.iters = fn, warmup, iters

    def __call__(self, *args, **kwargs) -> float:
        for _ in range(self.warmup):
            jax.block_until_ready(self.fn(*args, **kwargs))
        times = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            out = self.fn(*args, **kwargs)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
