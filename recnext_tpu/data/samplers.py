"""Repeated-augmentation sampler as a pure index function.

Reference: RASampler (/root/reference/data/samplers.py:9-64) — deterministic per-epoch
shuffle, each index repeated 3x so different augmented versions land on different
replicas, rank-strided subsample, truncated to floor(len/256)*256/replicas.
Implemented as a pure function of (n, epoch, rank, num_replicas) so it is trivially
unit-testable and host-shardable (SURVEY.md §4 "multi-node testing" note).
"""

from __future__ import annotations

import numpy as np


def ra_sampler_indices(
    n: int,
    epoch: int,
    rank: int = 0,
    num_replicas: int = 1,
    *,
    shuffle: bool = True,
    repeats: int = 3,
) -> np.ndarray:
    num_samples = int(np.ceil(n * repeats / num_replicas))
    total_size = num_samples * num_replicas
    num_selected = int(n // 256 * 256 / num_replicas)
    if num_selected == 0:  # tiny datasets (tests): keep everything
        num_selected = num_samples

    if shuffle:
        g = np.random.default_rng(epoch)
        indices = g.permutation(n)
    else:
        indices = np.arange(n)
    indices = np.repeat(indices, repeats)
    if total_size > len(indices):
        indices = np.concatenate([indices, indices[: total_size - len(indices)]])
    indices = indices[rank:total_size:num_replicas]
    assert len(indices) == num_samples
    return indices[:num_selected]


def distributed_eval_indices(n: int, rank: int = 0, num_replicas: int = 1) -> np.ndarray:
    """Plain strided eval split (reference main.py:229-237), padded to divisibility
    (the reference warns this slightly alters eval results; we pad identically)."""
    num_samples = int(np.ceil(n / num_replicas))
    total = num_samples * num_replicas
    indices = np.arange(n)
    if total > n:
        indices = np.concatenate([indices, indices[: total - n]])
    return indices[rank:total:num_replicas]
