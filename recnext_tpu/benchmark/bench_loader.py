"""Host input-pipeline throughput: PIL vs native C++ train/eval paths.

The reference feeds each GPU with 10 torch-DataLoader PIL workers
(/root/reference/main.py:242-259); this host has ONE core, so train-path
throughput gates real-data training (PERF.md "Input pipelines": 157 img/s PIL
vs ~2,200 img/s m1 device demand). This benchmark measures what the native
fused decode+RandomResizedCrop+flip path (native/recnext_io.cpp,
loader._native_train_batches) buys on ImageNet-shaped JPEGs.

Usage: python -m recnext_tpu.benchmark.bench_loader [--n 256] [--size 224]
Prints one JSON line per pipeline configuration.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def make_folder(root: Path, n: int, w: int = 500, h: int = 375) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    d = root / "train" / "c0"
    d.mkdir(parents=True)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        # photo-like content: smooth gradients + noise (JPEG size ~ real photos)
        arr = np.stack([
            (xx * 2 + i * 17) % 256,
            (yy * 3 + 50 * np.sin(xx / 40 + i)) % 256,
            rng.integers(0, 256, (h, w)),
        ], -1).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:04d}.jpg", "JPEG", quality=90)


def bench(loader_factory, n_images: int, warm_batches: int = 2) -> float:
    it = iter(loader_factory())
    for _ in range(warm_batches):
        next(it)
    t0 = time.perf_counter()
    seen = 0
    for batch in it:
        seen += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return seen / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args(argv)

    from recnext_tpu.data import native as native_io
    from recnext_tpu.data.datasets import ImageFolder
    from recnext_tpu.data.loader import train_loader
    from recnext_tpu.data.transforms import SimpleTrainTransform, TrainTransform

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        make_folder(root, args.n)
        ds = ImageFolder(str(root / "train"))
        results = {}
        configs = [
            ("pil_full_aug", TrainTransform(args.size), False),
            ("native_full_aug", TrainTransform(args.size), True),
            ("pil_simple", SimpleTrainTransform(args.size), False),
            ("native_simple", SimpleTrainTransform(args.size), True),
        ]
        for name, t, native in configs:
            if native and not native_io.available():
                continue
            rate = bench(
                lambda t=t, native=native: train_loader(
                    ds, t, batch_size=args.batch_size, epoch=0, seed=0,
                    native=native),
                args.n)
            results[name] = round(rate, 1)
            print(json.dumps({"pipeline": name, "images_per_sec": round(rate, 1),
                              "size": args.size}))
        if "pil_full_aug" in results and "native_full_aug" in results:
            print(json.dumps({
                "metric": "native_train_loader_speedup",
                "full_aug": round(results["native_full_aug"] / results["pil_full_aug"], 2),
                "simple": round(results.get("native_simple", 0)
                                / max(results.get("pil_simple", 1), 1e-9), 2),
            }))


if __name__ == "__main__":
    main()
