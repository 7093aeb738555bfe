"""Datasets: ImageFolder (ImageNet layout), CIFAR-100 (python pickle format), and a
synthetic dataset for smoke tests — no torchvision dependency.

Reference: build_dataset (/root/reference/data/datasets.py:64-140) supporting
CIFAR/IMNET/... ; here IMNET = ImageFolder, CIFAR = the standard cifar-100-python
directory, FAKE = deterministic synthetic images (the multi-process integration-test
stand-in for /root/reference/dist_train_cifar.sh when no dataset is on disk).
"""

from __future__ import annotations

import io
import pickle
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class ImageFolder:
    """class-per-directory image dataset; returns (PIL.Image, label)."""

    def __init__(self, root: str):
        self.root = Path(root)
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (p, self.class_to_idx[c])
            for c in classes
            for p in sorted((self.root / c).rglob("*"))
            if p.suffix.lower() in IMG_EXTENSIONS
        ]
        self.nb_classes = len(classes)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from PIL import Image

        path, label = self.samples[i]
        with open(path, "rb") as f:
            img = Image.open(io.BytesIO(f.read()))
            img.load()
        return img, label


class CIFAR100:
    """cifar-100-python pickle directory (train/test files)."""

    nb_classes = 100

    def __init__(self, root: str, train: bool = True):
        path = Path(root) / "cifar-100-python" / ("train" if train else "test")
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        self.data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = np.asarray(d[b"fine_labels"], np.int32)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i: int):
        from PIL import Image

        return Image.fromarray(self.data[i]), int(self.labels[i])


class INatDataset:
    """iNaturalist 2018/2019 JSON-annotation dataset with category targeting
    (reference INatDataset, /root/reference/data/datasets.py:20-61): images listed in
    train{year}.json / val{year}.json, labels re-mapped through categories.json to the
    chosen taxonomic rank (kingdom/phylum/.../name)."""

    def __init__(self, root: str, train: bool = True, year: int = 2018,
                 category: str = "name"):
        import json

        self.root = Path(root)
        anno = self.root / (f"train{year}.json" if train else f"val{year}.json")
        with open(anno) as f:
            data = json.load(f)
        with open(self.root / "categories.json") as f:
            categories = json.load(f)

        targets = sorted({c[category] for c in categories})
        self.target_to_idx = {t: i for i, t in enumerate(targets)}
        self.nb_classes = len(targets)
        cat_by_id = {c["id"]: c for c in categories}

        ann_by_image = {a["image_id"]: a["category_id"] for a in data["annotations"]}
        self.samples = []
        for img in data["images"]:
            cat_id = ann_by_image[img["id"]]
            label = self.target_to_idx[cat_by_id[cat_id][category]]
            self.samples.append((self.root / img["file_name"], label))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from PIL import Image

        path, label = self.samples[i]
        with open(path, "rb") as f:
            img = Image.open(io.BytesIO(f.read()))
            img.load()
        return img, label


class FakeData:
    """Deterministic synthetic images with a class-dependent signal (class color +
    noise) — learnable end-to-end, so smoke training shows accuracy actually rising
    (the role dist_train_cifar.sh plays for the reference, SURVEY.md §4.4)."""

    def __init__(self, n: int = 1024, size: int = 224, nb_classes: int = 1000):
        self.n, self.size, self.nb_classes = n, size, nb_classes

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        from PIL import Image

        label = int(i % self.nb_classes)
        g = np.random.default_rng(i)
        color = np.random.default_rng(label).integers(40, 216, size=3)
        noise = g.integers(-40, 41, size=(self.size, self.size, 3))
        arr = np.clip(color[None, None] + noise, 0, 255).astype(np.uint8)
        return Image.fromarray(arr, "RGB"), label


class TarImageFolder:
    """ImageNet-in-a-tar (timm DatasetTar counterpart, reference
    data/datasets.py:72-76: `train.tar` / `val.tar` holding class-dir/image
    entries). The tar is indexed once at init; members are read on demand with a
    per-worker reopened handle (tarfile handles are not thread-safe)."""

    def __init__(self, tar_path: str):
        import tarfile
        import threading

        self.path = str(tar_path)
        self._local = threading.local()
        with tarfile.open(self.path) as tf:
            entries = []
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                parts = m.name.split("/")
                if len(parts) < 2:
                    continue
                if "." + parts[-1].rsplit(".", 1)[-1].lower() not in IMG_EXTENSIONS:
                    continue
                entries.append((m.name, parts[-2]))
        entries.sort()
        classes = sorted({c for _, c in entries})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [(name, self.class_to_idx[c]) for name, c in entries]
        self.nb_classes = len(classes)

    def __len__(self):
        return len(self.samples)

    def _tar(self):
        import tarfile

        if getattr(self._local, "tf", None) is None:
            self._local.tf = tarfile.open(self.path)
        return self._local.tf

    def __getitem__(self, i: int):
        from PIL import Image

        name, label = self.samples[i]
        data = self._tar().extractfile(name).read()
        img = Image.open(io.BytesIO(data))
        img.load()
        return img, label


class RepeatDataset:
    """Repeat a dataset n times (reference FLOWERS: ConcatDataset x100 so an epoch
    is a reasonable length on a 1k-image set, data/datasets.py:84-89)."""

    def __init__(self, dataset, repeats: int):
        self.dataset = dataset
        self.repeats = repeats
        self.nb_classes = getattr(dataset, "nb_classes", None)

    def __len__(self):
        return len(self.dataset) * self.repeats

    def __getitem__(self, i: int):
        return self.dataset[i % len(self.dataset)]


class SegFolder:
    """ADE20K-style segmentation layout: <root>/images/<split>/*.jpg paired with
    <root>/annotations/<split>/*.png (label PNGs, 0 = ignore -> remapped to 255,
    classes 1..150 -> 0..149 per the mmseg ADE20KDataset convention)."""

    def __init__(self, root: str, split: str = "training", reduce_zero_label: bool = True):
        self.root = Path(root)
        img_dir = self.root / "images" / split
        ann_dir = self.root / "annotations" / split
        self.reduce_zero_label = reduce_zero_label
        self.samples = []
        for p in sorted(img_dir.glob("*")):
            if p.suffix.lower() not in IMG_EXTENSIONS:
                continue
            ann = ann_dir / (p.stem + ".png")
            if ann.exists():
                self.samples.append((p, ann))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from PIL import Image

        img_p, ann_p = self.samples[i]
        img = Image.open(img_p).convert("RGB")
        seg = np.asarray(Image.open(ann_p), dtype=np.int32)
        if self.reduce_zero_label:
            seg = np.where(seg == 0, 256, seg) - 1  # 0 -> 255 (ignore), k -> k-1
        return img, seg


def build_dataset(is_train: bool, data_set: str, data_path: str,
                  input_size: int = 224, fake_classes: int = 1000) -> Tuple[object, int]:
    """(dataset, nb_classes) — reference data/datasets.py:64-99 counterpart."""
    if data_set == "CIFAR":
        ds = CIFAR100(data_path, train=is_train)
        return ds, 100
    if data_set == "IMNET":
        prefix = "train" if is_train else "val"
        tar = Path(data_path) / f"{prefix}.tar"
        if tar.exists():  # timm-tar layout (reference datasets.py:72-76)
            return TarImageFolder(str(tar)), 1000
        ds = ImageFolder(str(Path(data_path) / prefix))
        return ds, 1000
    if data_set == "IMNETEE":
        root = Path(data_path) / ("train" if is_train else "val")
        return ImageFolder(str(root)), 10
    if data_set == "FLOWERS":
        root = Path(data_path) / ("train" if is_train else "test")
        ds = ImageFolder(str(root))
        if is_train:
            ds = RepeatDataset(ds, 100)
        return ds, 102
    if data_set == "FOLDER":
        root = Path(data_path) / ("train" if is_train else "val")
        ds = ImageFolder(str(root))
        return ds, ds.nb_classes
    if data_set == "FAKE":
        ds = FakeData(n=2048 if is_train else 512, size=input_size,
                      nb_classes=fake_classes)
        return ds, fake_classes
    if data_set in ("INAT", "INAT19"):
        year = 2018 if data_set == "INAT" else 2019
        ds = INatDataset(data_path, train=is_train, year=year)
        return ds, ds.nb_classes
    raise ValueError(f"unknown data_set {data_set!r}")
