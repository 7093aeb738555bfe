"""Generate a tiny COCO-format detection dataset (class-colored rectangles with
polygon segmentations) for smoking the COCO pipeline end to end without real
COCO on disk:

  python examples/make_tiny_coco.py --out /tmp/cocotiny
  python -m recnext_tpu.tasks.train_det --backbone recnext_m0 --detector mask_rcnn \
      --with-mask --data-set COCO --data-path /tmp/cocotiny --img-size 256 \
      --batch-size 8 --epochs 40 --steps-per-epoch 25 --eval-every 8

Layout matches the real thing (annotations/instances_{train,val}2017.json +
{train,val}2017/ image dirs); category ids are deliberately non-contiguous to
exercise the loader's id remapping. The class determines the rectangle color,
so AP on the held-out val split measures actual learning.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image


def generate(root: str, classes: int = 6, n_train: int = 64, n_val: int = 32,
             seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/annotations", exist_ok=True)
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        os.makedirs(f"{root}/{split}", exist_ok=True)
        images, anns = [], []
        aid = 1
        for i in range(n):
            W = int(rng.integers(140, 260))
            H = int(rng.integers(120, 220))
            img = rng.normal(scale=0.3, size=(H, W, 3)) * 60 + 110
            for _ in range(int(rng.integers(1, 4))):
                w = int(rng.integers(W // 6, W // 2))
                h = int(rng.integers(H // 6, H // 2))
                x1 = int(rng.integers(0, W - w))
                y1 = int(rng.integers(0, H - h))
                cls = int(rng.integers(0, classes))
                color = np.random.default_rng(cls).uniform(-1.5, 1.5, 3) * 60 + 110
                img[y1:y1 + h, x1:x1 + w] = color + rng.normal(scale=6, size=(h, w, 3))
                anns.append({"id": aid, "image_id": i,
                             "category_id": cls * 10 + 3,  # non-contiguous ids
                             "bbox": [x1, y1, w, h], "area": w * h, "iscrowd": 0,
                             "segmentation": [[x1, y1, x1 + w, y1, x1 + w, y1 + h,
                                               x1, y1 + h]]})
                aid += 1
            fn = f"{i:06d}.jpg"
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                f"{root}/{split}/{fn}", "JPEG", quality=92)
            images.append({"id": i, "file_name": fn, "width": W, "height": H})
        data = {"images": images, "annotations": anns,
                "categories": [{"id": c * 10 + 3, "name": f"c{c}"}
                               for c in range(classes)]}
        name = ("instances_train2017.json" if split == "train2017"
                else "instances_val2017.json")
        with open(f"{root}/annotations/{name}", "w") as f:
            json.dump(data, f)
        print(f"{split}: {len(images)} images, {len(anns)} annotations")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--classes", type=int, default=6)
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--val", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    generate(a.out, a.classes, a.train, a.val, a.seed)
