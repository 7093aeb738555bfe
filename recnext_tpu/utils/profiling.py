"""Profiling / tracing utilities — the torch.profiler counterpart
(SURVEY.md §5: demo/fused_model_evaluation.ipynb recipes, speed_gpu.py timing loops).

* `trace(logdir)`     — jax.profiler context; open the result in Perfetto/TensorBoard
  (the export_chrome_trace counterpart).
* `annotate(name)`    — named trace region for the hot loop.
* `device_time(fn, *args, chain_idx)` — per-op device timing that survives the remote
  (axon) runtime's dispatch dedup (scan-chained; see PERF.md for why naive
  block_until_ready loops lie here).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_time(fn, *args, chain_idx: int = 0, iters: int = 50) -> float:
    """ms per invocation of jit(fn)(*args); see recnext_tpu/benchmark/micro.py."""
    from recnext_tpu.benchmark.micro import timeit

    return timeit(fn, *args, chain_idx=chain_idx, iters=iters)


class Stopwatch:
    """Wall-clock stopwatch with device sync for coarse (>100ms) sections."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
