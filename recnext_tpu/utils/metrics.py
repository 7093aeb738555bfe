"""Metric tracking — SmoothedValue / MetricLogger counterparts
(/root/reference/utils.py:11-153): windowed median/average plus global average, with
cross-process synchronization done the TPU way (one jnp.psum-style all-reduce of
[count, total] via jax.experimental.multihost_utils) instead of NCCL all_reduce.
"""

from __future__ import annotations

import collections
import time
from typing import Dict

import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window; global stats over the full run."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """All-reduce [count, total] across hosts (utils.py:29-41 counterpart)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], np.float64)
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    """log_every-style iteration logger with ETA (utils.py:109-153 counterpart)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = "", total: int = 0):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        t_prev = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - t_prev)
            t_prev = time.time()
            if print_freq and i % print_freq == 0:
                eta = ""
                if total:
                    eta = f" eta: {iter_time.global_avg * (total - i):.0f}s"
                print(f"{header} [{i}{'/' + str(total) if total else ''}]"
                      f" {self}{eta} iter_t: {iter_time}", flush=True)
            i += 1
        print(f"{header} done in {time.time() - start:.1f}s", flush=True)
