"""grain-based input pipeline — the production-grade alternative to the thread
prefetcher in data/loader.py (SURVEY.md §2.4 recommends grain/tf.data for the TPU
rebuild of the reference's torch DataLoader, /root/reference/main.py:242-259).

Wraps any of our datasets (ImageFolder/CIFAR100/FakeData/INat) as a grain
RandomAccessDataSource, applies the PIL transform in grain worker processes, and
yields NHWC float32 batches. Multi-host sharding via grain.ShardOptions.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class _Source:
    """grain RandomAccessDataSource view over our (PIL, label) datasets."""

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i: int):
        return int(i)  # defer decode to the map transform (workers)


def build_grain_loader(
    dataset,
    transform,
    *,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    rank: int = 0,
    num_replicas: int = 1,
):
    """Returns an iterator of {"image": (B,H,W,3) f32, "label": (B,) i32} batches."""
    import grain.python as pg

    ds = dataset

    class Decode(pg.RandomMapTransform):
        def random_map(self, i, rng: np.random.Generator):
            img, label = ds[int(i)]
            return {"image": transform(rng, img), "label": np.int32(label)}

    sampler = pg.IndexSampler(
        num_records=len(dataset),
        shard_options=pg.ShardOptions(shard_index=rank, shard_count=num_replicas,
                                      drop_remainder=True),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = pg.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=[Decode(), pg.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
    return iter(loader)
