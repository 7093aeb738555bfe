"""Batched input pipeline: sampler indices -> transformed samples -> NHWC batches,
with background prefetch. Built on grain when worker parallelism helps; a thread
prefetcher otherwise (the DataLoader(10 workers, pin_mem) counterpart,
/root/reference/main.py:242-259).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from recnext_tpu.data.samplers import distributed_eval_indices, ra_sampler_indices


def _batches(dataset, transform, indices, batch_size, seed, drop_last):
    n = len(indices)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = indices[start : start + batch_size]
        imgs, labels = [], []
        for j, i in enumerate(idx):
            rng = np.random.default_rng((seed, int(i), start + j))
            img, label = dataset[int(i)]
            imgs.append(transform(rng, img))
            labels.append(label)
        yield {
            "image": np.stack(imgs).astype(np.float32),
            "label": np.asarray(labels, np.int32),
        }


class Prefetcher:
    """Runs the sample pipeline in a background thread, keeping `depth` batches ready."""

    def __init__(self, gen_factory: Callable[[], Iterator], depth: int = 2):
        self._factory = gen_factory
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = object()

        def worker():
            try:
                for item in self._factory():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def train_loader(
    dataset,
    transform,
    *,
    batch_size: int,
    epoch: int,
    rank: int = 0,
    num_replicas: int = 1,
    repeated_aug: bool = True,
    seed: int = 0,
    prefetch: int = 2,
):
    if repeated_aug:
        indices = ra_sampler_indices(len(dataset), epoch, rank, num_replicas)
    else:
        g = np.random.default_rng((seed, epoch))
        indices = g.permutation(len(dataset))[rank::num_replicas]
    factory = lambda: _batches(dataset, transform, indices, batch_size,
                               seed=(seed, epoch), drop_last=True)
    return Prefetcher(factory, depth=prefetch)


def eval_loader(
    dataset,
    transform,
    *,
    batch_size: int,
    rank: int = 0,
    num_replicas: int = 1,
    prefetch: int = 2,
):
    indices = distributed_eval_indices(len(dataset), rank, num_replicas)
    factory = lambda: _batches(dataset, transform, indices, batch_size,
                               seed=(0,), drop_last=False)
    return Prefetcher(factory, depth=prefetch)
