"""Detection training CLI — the counterpart of the reference's mmdet harness
(/root/reference/detection/train.py + mask_rcnn_recnext_m*_fpn_1x_coco.py: AdamW
lr 2e-4 wd 0.05, 12-epoch 1x schedule with decay at epochs 8/11, frozen-BN backbone
initialized from a classification checkpoint).

Drives either the two-stage Mask R-CNN or single-stage RetinaNet entirely inside one
jitted step. COCO itself needs the dataset on disk; `--data-set FAKE` trains on
synthetic colored-rectangle scenes so the full harness is exercisable anywhere.

Smoke: python -m recnext_tpu.tasks.train_det --backbone recnext_m0 --detector retinanet \
    --epochs 2 --steps-per-epoch 4 --img-size 128 --batch-size 2 --num-classes 5
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_det_batch(rng: np.random.Generator, batch: int, img: int,
                        num_classes: int, max_gt: int = 4):
    """Colored rectangles on noise; boxes/labels padded to max_gt with -1."""
    images = rng.normal(scale=0.3, size=(batch, img, img, 3)).astype(np.float32)
    boxes = np.full((batch, max_gt, 4), -1, np.float32)
    labels = np.full((batch, max_gt), -1, np.int32)
    for b in range(batch):
        n = int(rng.integers(1, max_gt + 1))
        for g in range(n):
            w, h = rng.integers(img // 6, img // 2, 2)
            x1 = int(rng.integers(0, img - w))
            y1 = int(rng.integers(0, img - h))
            cls = int(rng.integers(0, num_classes))
            color = np.random.default_rng(cls).uniform(-1.5, 1.5, 3)
            images[b, y1:y1 + h, x1:x1 + w] = color + rng.normal(
                scale=0.1, size=(h, w, 3))
            boxes[b, g] = [x1, y1, x1 + w, y1 + h]
            labels[b, g] = cls
    return {"image": images, "gt_boxes": boxes, "gt_labels": labels}


def step_lr(base_lr: float, steps_per_epoch: int, decay_epochs=(8, 11),
            factor: float = 0.1):
    """mm 1x step schedule (by-epoch decays)."""

    def sched(step):
        epoch = step // steps_per_epoch
        lr = base_lr
        for e in decay_epochs:
            lr = jnp.where(epoch >= e, lr * factor, lr)
        return lr

    return sched


def main(argv=None):
    p = argparse.ArgumentParser("Detection training")
    p.add_argument("--backbone", default="recnext_m3")
    p.add_argument("--detector", default="mask_rcnn", choices=["mask_rcnn", "retinanet"])
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--steps-per-epoch", type=int, default=0, help="0 = 1000")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--num-proposals", type=int, default=128)
    p.add_argument("--data-set", default="FAKE", choices=["FAKE"])
    p.add_argument("--init-ckpt", default="", help="classification ckpt (.pth)")
    p.add_argument("--output-dir", default="runs/det")
    args = p.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import optax

    from recnext_tpu.models.registry import get_config
    from recnext_tpu.tasks.detection import (
        RetinaNet,
        generate_anchors,
        init_backbone_from_classification,
        make_detection_train_step,
    )
    from recnext_tpu.tasks.mask_rcnn import MaskRCNN, mask_rcnn_loss
    from recnext_tpu.train.state import TrainState

    steps_per_epoch = args.steps_per_epoch or 1000
    cfg = get_config(args.backbone, num_classes=0)
    x0 = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
    tx = optax.adamw(step_lr(args.lr, steps_per_epoch),
                     weight_decay=args.weight_decay)

    if args.detector == "retinanet":
        model = RetinaNet(backbone_cfg=cfg, num_classes=args.num_classes,
                          frozen_backbone_stats=False)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        feat_shapes = [(args.img_size // s, args.img_size // s)
                       for s in (4, 8, 16, 32, 64)]
        anchors = jnp.asarray(generate_anchors(feat_shapes,
                                               strides=(4, 8, 16, 32, 64)))
        train_step = jax.jit(make_detection_train_step(
            model, tx, anchors, num_classes=args.num_classes))
    else:
        model = MaskRCNN(backbone_cfg=cfg, num_classes=args.num_classes,
                         num_proposals=args.num_proposals,
                         frozen_backbone_stats=False, with_mask=False)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

        def loss_fn(params, batch_stats, batch, rng):
            out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                                   batch["image"], training=True,
                                   mutable=["batch_stats"],
                                   rngs={"droppath": rng, "dropout": rng})
            return mask_rcnn_loss(out, batch, num_classes=args.num_classes), \
                mut["batch_stats"]

        @jax.jit
        def train_step(state, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_bs, opt_state=new_opt), {"loss": loss}

    if args.init_ckpt:
        from recnext_tpu.convert import load_torch_checkpoint

        variables = init_backbone_from_classification(
            variables, load_torch_checkpoint(args.init_ckpt))

    state = TrainState.create(variables, tx, ema=False)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for epoch in range(args.epochs):
        losses = []
        for _ in range(steps_per_epoch):
            batch = synthetic_det_batch(rng, args.batch_size, args.img_size,
                                        args.num_classes)
            state, metrics = train_step(state, {k: jnp.asarray(v)
                                                for k, v in batch.items()})
            losses.append(float(metrics["loss"]))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "elapsed_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        with open(out / "log.txt", "a") as f:
            f.write(json.dumps(rec) + "\n")
        if not np.isfinite(rec["loss"]):
            raise SystemExit(f"Loss is {rec['loss']}, stopping")
    return state


if __name__ == "__main__":
    main()
