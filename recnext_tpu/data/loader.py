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


def _batches(dataset, transform, indices, batch_size, seed, drop_last,
             aug_splits=0, clean_transform=None):
    """aug_splits > 1 (timm AugMixDataset layout, moganet --aug-splits): each batch
    holds `aug_splits` blocks over the SAME samples — block 0 through
    clean_transform, the rest independently through `transform`; labels repeat
    per block."""
    n = len(indices)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = indices[start : start + batch_size]
        if aug_splits > 1:
            blocks = [[] for _ in range(aug_splits)]
            labels = []
            for j, i in enumerate(idx):
                img, label = dataset[int(i)]
                labels.append(label)
                for s in range(aug_splits):
                    rng = np.random.default_rng((seed, int(i), start + j, s))
                    t = clean_transform if s == 0 else transform
                    blocks[s].append(t(rng, img))
            imgs = [im for block in blocks for im in block]
            labels = labels * aug_splits
        else:
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


class _PrefetchError:
    """Out-of-band wrapper so a worker exception can never collide with a
    legitimately-yielded item (e.g. a factory that yields 2-tuples)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class Prefetcher:
    """Runs the sample pipeline in a background thread, keeping `depth` batches ready."""

    def __init__(self, gen_factory: Callable[[], Iterator], depth: int = 2):
        self._factory = gen_factory
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = object()

        def worker():
            # a pipeline error must reach the consumer, not silently truncate
            # the epoch (a corrupt file would otherwise end iteration early and
            # eval would report accuracy over a partial dataset with exit 0)
            try:
                for item in self._factory():
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised on the consumer side
                q.put(_PrefetchError(e))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, _PrefetchError):
                raise RuntimeError("input pipeline worker failed") from item.exc
            yield item


def _samples_on_disk(dataset) -> bool:
    """The native C++ decoder open()s dataset.samples[i][0] as a filesystem
    path. TarImageFolder also exposes `samples`, but its paths are tar MEMBER
    names — probe the first one so tar-backed (or any virtual) datasets fall
    back to the PIL path instead of crashing the prefetch worker."""
    import os

    samples = getattr(dataset, "samples", None)
    if not samples:
        return False
    return os.path.isfile(samples[0][0])


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
    aug_splits: int = 0,
    clean_transform=None,
    native: bool = False,
):
    if repeated_aug:
        indices = ra_sampler_indices(len(dataset), epoch, rank, num_replicas)
    else:
        g = np.random.default_rng((seed, epoch))
        indices = g.permutation(len(dataset))[rank::num_replicas]
    if native and aug_splits <= 1:
        from recnext_tpu.data import native as native_io

        if native_io.available() and _samples_on_disk(dataset):
            factory = lambda: _native_train_batches(dataset, transform, indices,
                                                    batch_size, seed=(seed, epoch))
            return Prefetcher(factory, depth=prefetch)
    factory = lambda: _batches(dataset, transform, indices, batch_size,
                               seed=(seed, epoch), drop_last=True,
                               aug_splits=aug_splits,
                               clean_transform=clean_transform)
    return Prefetcher(factory, depth=prefetch)


def _native_train_batches(dataset, transform, indices, batch_size, seed):
    """Training fast path (the reference feeds GPUs with 10 torch-DataLoader PIL
    workers/GPU, /root/reference/main.py:242-259; this host has one core):
    decode + RandomResizedCrop + flip run fused in C++ threads
    (native.batch_decode_crop*), with the SAME per-sample rng stream as _batches
    — rrc_rect and the flip draw consume the draws random_resized_crop would —
    so native and PIL paths yield identical geometry. With a full TrainTransform
    the C++ stage emits PIL-rounded uint8 crops and transform.post_crop runs the
    remaining augs on the small (size x size) image; with SimpleTrainTransform
    (post_crop None) normalization fuses natively too."""
    import io as _io

    from PIL import Image

    from recnext_tpu.data import native as native_io
    from recnext_tpu.data.transforms import rrc_rect

    post = getattr(transform, "post_crop", None)
    size = transform.size
    scale = getattr(transform, "rrc_scale", (0.08, 1.0))
    n = len(indices)
    end = n - (n % batch_size)
    for start in range(0, end, batch_size):
        idx = indices[start : start + batch_size]
        blobs, labels, crops, rngs = [], [], [], []
        for j, i in enumerate(idx):
            path, label = dataset.samples[int(i)]
            with open(path, "rb") as f:
                blob = f.read()
            rng = np.random.default_rng((seed, int(i), start + j))
            with Image.open(_io.BytesIO(blob)) as im:  # header-only read
                w, h = im.size
            x, y, cw, ch = rrc_rect(rng, w, h, scale=scale)
            flip = 1.0 if rng.random() < 0.5 else 0.0
            crops.append([x, y, cw, ch, flip])
            blobs.append(blob)
            labels.append(label)
            rngs.append(rng)
        carr = np.asarray(crops, np.float32)
        if post is None:
            out = native_io.batch_decode_crop(blobs, carr, size, n_threads=4)
        else:
            u8 = native_io.batch_decode_crop_u8(blobs, carr, size, n_threads=4)
            out = None if u8 is None else np.stack(
                [post(r, a) for r, a in zip(rngs, u8)]).astype(np.float32)
        if out is None:  # corrupt/non-JPEG in batch: PIL per-sample, fresh rngs
            out = np.stack([
                transform(np.random.default_rng((seed, int(i), start + j)),
                          Image.open(_io.BytesIO(b)).convert("RGB"))
                for (j, i), b in zip(enumerate(idx), blobs)
            ]).astype(np.float32)
        yield {"image": out, "label": np.asarray(labels, np.int32)}


def eval_loader(
    dataset,
    transform,
    *,
    batch_size: int,
    rank: int = 0,
    num_replicas: int = 1,
    prefetch: int = 2,
    native: bool = False,
):
    indices = distributed_eval_indices(len(dataset), rank, num_replicas)
    if native:
        from recnext_tpu.data import native as native_io

        if native_io.available() and _samples_on_disk(dataset):
            size = getattr(transform, "size", 224)
            crop_pct = getattr(transform, "crop_pct", 224 / 256)
            factory = lambda: _native_eval_batches(dataset, indices, batch_size,
                                                   size, crop_pct)
            return Prefetcher(factory, depth=prefetch)
    factory = lambda: _batches(dataset, transform, indices, batch_size,
                               seed=(0,), drop_last=False)
    return Prefetcher(factory, depth=prefetch)


def _native_eval_batches(dataset, indices, batch_size, size, crop_pct):
    """Fast path: raw JPEG bytes -> native C++ decode + fused antialiased-bicubic
    crop-resample + normalize (recnext_tpu/data/native.py). The float crop rect
    reproduces transforms.resize_center_crop's geometry EXACTLY (same rounding of
    the intermediate resize target), and the native resampler is PIL-convention
    bicubic, so this path matches the PIL path up to PIL's uint8 intermediate
    quantization (~1 LSB)."""
    import numpy as np

    from recnext_tpu.data import native as native_io

    for start in range(0, len(indices), batch_size):
        idx = indices[start : start + batch_size]
        blobs, labels, crops = [], [], []
        for i in idx:
            path, label = dataset.samples[int(i)]
            with open(path, "rb") as f:
                blob = f.read()
            blobs.append(blob)
            labels.append(label)
            crops.append([0.0, 0.0, -1.0, -1.0, 0.0])  # fixed below per image
        # image dims via PIL header-only read; decode itself happens in C++
        from PIL import Image
        import io as _io

        from recnext_tpu.data.transforms import center_crop_rect

        for j, blob in enumerate(blobs):
            with Image.open(_io.BytesIO(blob)) as im:
                w, h = im.size
            cx, cy, cw, ch, _ = center_crop_rect(w, h, size, crop_pct)
            crops[j] = [cx, cy, cw, ch, 0.0]
        out = native_io.batch_decode_crop(blobs, np.asarray(crops, np.float32),
                                          size, n_threads=4)
        if out is None:  # fallback mid-stream (corrupt file): PIL per-sample
            from recnext_tpu.data.transforms import EvalTransform

            t = EvalTransform(size, crop_pct)
            out = np.stack([
                t(None, Image.open(_io.BytesIO(b)).convert("RGB")) for b in blobs
            ]).astype(np.float32)
        yield {"image": out, "label": np.asarray(labels, np.int32)}
