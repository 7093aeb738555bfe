"""Segmentation data path: SegFolder layout, seg train transform, grain loader."""

import numpy as np
import pytest
from PIL import Image

from recnext_tpu.data.datasets import FakeData, SegFolder
from recnext_tpu.data.transforms import SimpleTrainTransform


def _make_ade_layout(root, n=3):
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / "training" / f"s{i}.jpg")
        seg = rng.integers(0, 151, size=(60, 80)).astype(np.uint8)
        Image.fromarray(seg).save(root / "annotations" / "training" / f"s{i}.png")


def test_segfolder_reduce_zero_label(tmp_path):
    _make_ade_layout(tmp_path)
    ds = SegFolder(str(tmp_path), split="training")
    assert len(ds) == 3
    img, seg = ds[0]
    assert img.size == (80, 60) and seg.shape == (60, 80)
    # label 0 became ignore=255; labels 1..150 shifted to 0..149
    assert set(np.unique(seg)).issubset(set(range(150)) | {255})


def test_seg_train_sample(tmp_path):
    from recnext_tpu.tasks.segmentation import seg_train_sample

    _make_ade_layout(tmp_path)
    ds = SegFolder(str(tmp_path), split="training")
    img, seg = ds[0]
    rng = np.random.default_rng(1)
    for _ in range(4):
        a, s = seg_train_sample(rng, img, seg, crop=64)
        assert a.shape == (64, 64, 3) and s.shape == (64, 64)
        assert s.dtype == np.int32


def test_grain_loader_batches():
    pg = pytest.importorskip("grain.python")
    from recnext_tpu.data.grain_loader import build_grain_loader

    ds = FakeData(n=32, size=32, nb_classes=4)
    it = build_grain_loader(ds, SimpleTrainTransform(32), batch_size=8, seed=0,
                            num_epochs=1, worker_count=0)
    batches = list(it)
    assert len(batches) == 4
    assert batches[0]["image"].shape == (8, 32, 32, 3)
    assert batches[0]["label"].shape == (8,)
    # sharded loader sees half the data
    it2 = build_grain_loader(ds, SimpleTrainTransform(32), batch_size=8, seed=0,
                             num_epochs=1, rank=0, num_replicas=2)
    assert len(list(it2)) == 2
