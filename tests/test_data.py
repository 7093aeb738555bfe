"""Data pipeline tests: RASampler index math (golden vs the reference implementation),
transforms sanity, loader batching."""

import numpy as np
import pytest
from PIL import Image

from recnext_tpu.data.datasets import FakeData, build_dataset
from recnext_tpu.data.loader import eval_loader, train_loader
from recnext_tpu.data.samplers import distributed_eval_indices, ra_sampler_indices
from recnext_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    normalize,
    rand_augment,
    random_erasing,
    random_resized_crop,
    resize_center_crop,
)


def _ref_ra_indices(n, epoch, rank, num_replicas):
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_samplers", "/root/reference/data/samplers.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class DS:
        def __len__(self):
            return n

    s = mod.RASampler(DS(), num_replicas=num_replicas, rank=rank, shuffle=True)
    s.set_epoch(epoch)
    return np.asarray(list(iter(s)))


@pytest.mark.parametrize("n,replicas", [(1000, 4), (2048, 8), (700, 2)])
def test_ra_sampler_structure_matches_reference(n, replicas):
    """Same structural properties as the reference RASampler: per-rank count,
    truncation, 3x repetition coverage, disjoint-rank interleave. (The shuffle
    permutation differs — numpy vs torch RNG — but the index *math* must match.)"""
    for epoch in (0, 3):
        for arrs, get in (("ref", _ref_ra_indices), ("ours", ra_sampler_indices)):
            per_rank = [np.asarray(get(n, epoch, r, replicas))
                        for r in range(replicas)]
            if arrs == "ours":
                ours_lens = [len(a) for a in per_rank]
            else:
                ref_lens = [len(a) for a in per_rank]
            # union over ranks covers each index <= 3 times (3x repeat)
            _, counts = np.unique(np.concatenate(per_rank), return_counts=True)
            assert counts.max() <= 3, arrs
            if replicas >= 3:
                # disjoint-rank interleave: the 3 consecutive copies of each
                # element land on 3 DIFFERENT ranks, so no rank sees an index
                # twice (holds for the reference and must hold here)
                for a in per_rank:
                    assert len(np.unique(a)) == len(a), arrs
        assert ours_lens == ref_lens  # floor(n*3/replicas ...) truncation math


def test_ra_sampler_deterministic_per_epoch():
    a = ra_sampler_indices(1000, 5, 0, 4)
    b = ra_sampler_indices(1000, 5, 0, 4)
    c = ra_sampler_indices(1000, 6, 0, 4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_eval_indices_padded():
    idx = distributed_eval_indices(10, rank=0, num_replicas=4)
    assert len(idx) == 3
    all_idx = np.concatenate([distributed_eval_indices(10, r, 4) for r in range(4)])
    assert set(all_idx.tolist()) == set(range(10))


def test_transforms_shapes_and_stats():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (300, 400, 3), dtype=np.uint8))
    t = TrainTransform(size=224)
    out = t(np.random.default_rng(1), img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    e = EvalTransform(size=224)
    out = e(None, img)
    assert out.shape == (224, 224, 3)
    # normalize roundtrip: a mid-gray image normalizes near zero
    gray = Image.new("RGB", (224, 224), (124, 116, 104))
    assert abs(normalize(gray)).mean() < 0.1


def test_rand_augment_runs_all_ops():
    img = Image.new("RGB", (64, 64), (128, 64, 32))
    for seed in range(30):  # enough draws to hit every op
        out = rand_augment(np.random.default_rng(seed), img)
        assert out.size == (64, 64)


def test_random_erasing_erases():
    arr = np.zeros((32, 32, 3), np.float32)
    out = random_erasing(np.random.default_rng(0), arr, p=1.0)
    assert np.abs(out).sum() > 0


def test_three_augment_transform():
    img = Image.new("RGB", (64, 64), (10, 200, 30))
    t = TrainTransform(size=32, three_augment=True)
    out = t(np.random.default_rng(0), img)
    assert out.shape == (32, 32, 3)


def test_jitter_only_on_three_augment_branch():
    """timm create_transform: auto-augment REPLACES color jitter, so the RA
    branch must ignore the jitter field; ThreeAugment (DeiT-III) appends it."""
    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 255, (80, 90, 3), np.uint8))

    ra = TrainTransform(size=32).post_crop(np.random.default_rng(1), img)
    ra_nojit = TrainTransform(size=32, jitter=0.0).post_crop(
        np.random.default_rng(1), img)
    np.testing.assert_array_equal(ra, ra_nojit)  # jitter inert under RA

    ta = TrainTransform(size=32, three_augment=True, reprob=0.0).post_crop(
        np.random.default_rng(1), img)
    ta_nojit = TrainTransform(size=32, three_augment=True, jitter=0.0,
                              reprob=0.0).post_crop(np.random.default_rng(1), img)
    assert not np.array_equal(ta, ta_nojit)  # 3A branch DOES jitter

    # the reference's `--aa ''` path: no RA, jitter applies
    noaa = TrainTransform(size=32, auto_augment=False, reprob=0.0).post_crop(
        np.random.default_rng(1), img)
    noaa_nojit = TrainTransform(size=32, auto_augment=False, jitter=0.0,
                                reprob=0.0).post_crop(np.random.default_rng(1), img)
    assert not np.array_equal(noaa, noaa_nojit)


def test_inat_dataset(tmp_path):
    import json

    from PIL import Image as PILImage

    from recnext_tpu.data.datasets import INatDataset

    (tmp_path / "train_val2018").mkdir()
    categories = [{"id": 10, "name": "sp_a", "kingdom": "Animalia"},
                  {"id": 20, "name": "sp_b", "kingdom": "Plantae"}]
    images, annotations = [], []
    rng = np.random.default_rng(0)
    for i, cat in enumerate([10, 20, 10]):
        fn = f"train_val2018/img{i}.jpg"
        PILImage.fromarray((rng.random((20, 20, 3)) * 255).astype(np.uint8)).save(
            tmp_path / fn)
        images.append({"id": i, "file_name": fn})
        annotations.append({"image_id": i, "category_id": cat})
    (tmp_path / "train2018.json").write_text(json.dumps(
        {"images": images, "annotations": annotations}))
    (tmp_path / "categories.json").write_text(json.dumps(categories))

    ds = INatDataset(str(tmp_path), train=True, year=2018, category="name")
    assert len(ds) == 3 and ds.nb_classes == 2
    img, label = ds[0]
    assert img.size == (20, 20) and label in (0, 1)
    # kingdom-level targeting collapses to 2 classes too, but remaps labels
    ds_k = INatDataset(str(tmp_path), train=True, year=2018, category="kingdom")
    assert ds_k.nb_classes == 2


def test_load_torch_checkpoint_file(tmp_path):
    """load_torch_checkpoint reads a torch.save'd {'model': state_dict} file."""
    import torch

    from recnext_tpu.convert import load_torch_checkpoint
    from tests.torch_ref import load_ref_module

    mod = load_ref_module("model/recnext.py", "ref_recnext_ckpt")
    tm = mod.RecNext(embed_dim=(8, 16, 32, 64), depth=(1, 0, 1, 0), mlp_ratio=2,
                     num_classes=4)
    path = tmp_path / "ckpt.pth"
    torch.save({"model": tm.state_dict(), "epoch": 3}, path)
    variables = load_torch_checkpoint(str(path))
    assert "params" in variables and "batch_stats" in variables
    k = variables["params"]["stem"]["conv1"]["conv"]["kernel"]
    assert k.shape == (3, 3, 3, 4)  # HWIO of the first stem conv (out = 8//2)


def test_loader_batches():
    ds, nb = build_dataset(True, "FAKE", "", input_size=32)
    assert nb == 1000
    t = TrainTransform(size=32)
    loader = train_loader(ds, t, batch_size=8, epoch=0, rank=0, num_replicas=2)
    batches = list(iter(loader))
    assert all(b["image"].shape == (8, 32, 32, 3) for b in batches)
    assert all(b["label"].shape == (8,) for b in batches)

    ev = eval_loader(FakeData(20, 32), EvalTransform(32), batch_size=8)
    sizes = [b["image"].shape[0] for b in iter(ev)]
    assert sum(sizes) == 20


def test_prefetcher_propagates_worker_errors():
    """A corrupt sample must raise at the consumer, not silently truncate the
    epoch (a truncated eval would report accuracy over a partial dataset)."""
    from recnext_tpu.data.loader import Prefetcher

    def bad_gen():
        yield {"image": 1}
        raise ValueError("corrupt file")

    it = iter(Prefetcher(lambda: bad_gen()))
    assert next(it) == {"image": 1}
    with pytest.raises(RuntimeError, match="input pipeline worker failed"):
        next(it)


def test_browse_contact_sheet(tmp_path):
    """Headless browse_dataset counterpart (data/browse.py — the reference's
    segmentation/tools/browse_dataset.py save-to-dir role): renders an
    augmentation contact sheet, de-normalization must invert normalize()."""
    from recnext_tpu.data.browse import denormalize, main

    # denormalize is the exact inverse of transforms.normalize on uint8 inputs
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(denormalize(normalize(img)), img)

    out = tmp_path / "sheet.png"
    sheet = main(["--data-set", "FAKE", "--input-size", "32", "--rows", "3",
                  "--draws", "4", "--out", str(out)])
    assert out.exists()
    # 3 rows x (orig + eval + 4 draws) of 32px tiles + 2px padding
    assert sheet.size == (6 * 34 + 2, 3 * 34 + 2)
    # augmented tiles differ across draws (the chain is actually stochastic)
    arr = np.asarray(sheet)
    tiles = [arr[2:34, 2 + c * 34:34 + c * 34] for c in range(2, 6)]
    assert any(not np.array_equal(tiles[0], t) for t in tiles[1:])
