"""Detection training CLI — the counterpart of the reference's mmdet harness
(/root/reference/detection/train.py:115-241 + configs/mask_rcnn_recnext_m*_fpn_1x_coco.py:
AdamW lr 2e-4 wd 0.05, 12-epoch 1x schedule with decay at epochs 8/11, frozen-BN
backbone initialized from a classification checkpoint, COCO bbox+segm mAP eval).

Drives either the two-stage Mask R-CNN or single-stage RetinaNet entirely inside one
jitted step. `--data-set COCO` consumes a COCO-format folder (annotations json +
image dir) and evaluates AP@[.5:.95] with the in-framework pure-numpy evaluator;
`--data-set FAKE` trains/evaluates on synthetic colored-rectangle scenes so the full
harness — including the AP loop — is exercisable anywhere. Checkpoints (orbax,
last-3 + auto-resume) and a JSONL log round out the mm runner roles; `--eval-only`
is the /root/reference/detection/test.py counterpart (checkpoint -> AP numbers)
and `--benchmark N` the segmentation/tools/benchmark.py fps harness.

Smoke: python -m recnext_tpu.tasks.train_det --backbone recnext_m0 --detector retinanet \
    --epochs 2 --steps-per-epoch 4 --img-size 128 --batch-size 2 --num-classes 5
COCO: python -m recnext_tpu.tasks.train_det --backbone recnext_m3 --data-set COCO \
    --data-path /data/coco --init-ckpt recnext_m3.pth
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_det_batch(rng: np.random.Generator, batch: int, img: int,
                        num_classes: int, max_gt: int = 4, with_masks: bool = False):
    """Colored rectangles on noise; boxes/labels padded to max_gt with -1."""
    images = rng.normal(scale=0.3, size=(batch, img, img, 3)).astype(np.float32)
    boxes = np.full((batch, max_gt, 4), -1, np.float32)
    labels = np.full((batch, max_gt), -1, np.int32)
    masks = np.zeros((batch, max_gt, img, img), np.uint8)
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
            masks[b, g, y1:y1 + h, x1:x1 + w] = 1
    out = {"image": images, "gt_boxes": boxes, "gt_labels": labels}
    if with_masks:
        out["gt_masks"] = masks
    return out


def step_lr(base_lr: float, steps_per_epoch: int, decay_epochs=(8, 11),
            factor: float = 0.1, warmup_steps: int = 500,
            warmup_ratio: float = 0.001):
    """mm 1x step schedule: linear warmup (500 iters from ratio 0.001, the mmdet
    default the reference configs inherit) + by-epoch decays."""

    def sched(step):
        epoch = step // steps_per_epoch
        lr = base_lr
        for e in decay_epochs:
            lr = jnp.where(epoch >= e, lr * factor, lr)
        if warmup_steps > 0:
            frac = jnp.minimum(step / warmup_steps, 1.0)
            lr = lr * (warmup_ratio + (1.0 - warmup_ratio) * frac)
        return lr

    return sched


class FakeDetDataset:
    """Deterministic synthetic detection set exposing the CocoDetection eval
    surface (gt_for_eval, nb_classes) so the AP loop runs without COCO on disk."""

    def __init__(self, n: int, img: int, num_classes: int, max_gt: int = 4,
                 with_masks: bool = False, seed: int = 0):
        self.n, self.img, self.nb_classes = n, img, num_classes
        self.max_gt, self.with_masks, self.seed = max_gt, with_masks, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        rng = np.random.default_rng((self.seed, i))
        s = synthetic_det_batch(rng, 1, self.img, self.nb_classes,
                                self.max_gt, with_masks=True)
        out = {"image": s["image"][0], "gt_boxes": s["gt_boxes"][0],
               "gt_labels": s["gt_labels"][0], "image_id": i, "scale": 1.0,
               "orig_hw": (self.img, self.img)}
        if self.with_masks:
            out["gt_masks"] = s["gt_masks"][0]
        return out

    def gt_for_eval(self, i: int):
        s = self[i]
        keep = s["gt_labels"] >= 0
        out = {"boxes": s["gt_boxes"][keep], "labels": s["gt_labels"][keep],
               "iscrowd": np.zeros(int(keep.sum()), bool), "image_id": i}
        if self.with_masks:
            out["masks"] = s["gt_masks"][keep]
        return out


def _det_batches(dataset, indices, batch_size, *, drop_last=True):
    from recnext_tpu.data.coco import collate_det

    n = len(indices)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        yield collate_det([dataset[int(i)] for i in indices[start:start + batch_size]])


def evaluate_detection(dataset, predict_fn, *, batch_size: int, with_mask: bool,
                       max_images: int = 0, score_thresh: float = 0.05):
    """Run fixed-shape inference over the val set, map boxes back to original
    coordinates, and compute COCO AP. predict_fn(images) ->
    (boxes, scores, labels, mask_probs|None, valid), all (B, D, ...)."""
    from recnext_tpu.tasks.coco_eval import COCOEvaluator
    from recnext_tpu.tasks.mask_rcnn import paste_masks

    ev = COCOEvaluator(dataset.nb_classes)
    n = min(len(dataset), max_images) if max_images else len(dataset)
    idx = list(range(n))
    # pad the tail so every device batch has the static shape; cycle idx in
    # case pad > n (batch_size > 2n would otherwise yield a short batch and a
    # second multi-minute jit compile at the odd shape)
    pad = (-n) % batch_size
    padded = idx + (idx * (pad // n + 1))[:pad] if pad else idx
    seen = 0
    for batch in _det_batches(dataset, padded, batch_size, drop_last=False):
        boxes, scores, labels, mprobs, valid = predict_fn(
            jnp.asarray(batch["image"]))
        boxes, scores, labels, valid = map(np.asarray,
                                           (boxes, scores, labels, valid))
        mprobs = np.asarray(mprobs) if mprobs is not None else None
        for b in range(len(boxes)):
            if seen >= n:
                break
            i = padded[seen]
            seen += 1
            keep = valid[b] & (scores[b] > score_thresh)
            scale = float(batch["scale"][b])
            orig_hw = batch["orig_hw"][b]
            pb = boxes[b][keep] / scale
            pb[:, 0::2] = pb[:, 0::2].clip(0, int(orig_hw[1]))
            pb[:, 1::2] = pb[:, 1::2].clip(0, int(orig_hw[0]))
            pred = {"boxes": pb, "scores": scores[b][keep],
                    "labels": labels[b][keep]}
            gt = dataset.gt_for_eval(i)
            if with_mask and mprobs is not None and "masks" in gt:
                pred["masks"] = paste_masks(mprobs[b][keep], boxes[b][keep],
                                            orig_hw, scale)
            ev.add(gt, pred)
    return ev.summarize()


def apply_preset(p: argparse.ArgumentParser, preset: str) -> None:
    """Apply a named recipe from tasks/configs.py:DETECTION_CONFIGS (the mm
    config-file counterpart) as parser defaults; explicit CLI flags override.
    img_scale (1333,800) maps onto this harness's square --img-size via the
    short side (the jittable pipeline trains on fixed square crops)."""
    from recnext_tpu.tasks.configs import DETECTION_CONFIGS

    if preset not in DETECTION_CONFIGS:
        raise SystemExit(f"unknown preset {preset!r}; "
                         f"known: {sorted(DETECTION_CONFIGS)}")
    c = DETECTION_CONFIGS[preset]
    p.set_defaults(backbone=c["backbone"], lr=c["lr"],
                   weight_decay=c["weight_decay"], epochs=c["epochs"],
                   decay_epochs=list(c["lr_decay_epochs"]),
                   batch_size=c["batch_size"], num_classes=c["num_classes"],
                   img_size=min(c["img_scale"]))


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--preset", default="",
                     help="named recipe from tasks/configs.py, e.g. "
                          "det_recnext_a3_fpn_1x_coco")
    pre_args, argv = pre.parse_known_args(argv)
    p = argparse.ArgumentParser("Detection training")
    p.add_argument("--backbone", default="recnext_m3")
    p.add_argument("--detector", default="mask_rcnn", choices=["mask_rcnn", "retinanet"])
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="0 = one pass over the dataset (FAKE: 1000)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--decay-epochs", type=int, nargs="*", default=[8, 11],
                   help="step-decay epochs (mm 1x default: 8 11)")
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--num-proposals", type=int, default=128)
    p.add_argument("--data-set", default="FAKE", choices=["FAKE", "COCO"])
    p.add_argument("--data-path", default="", help="COCO root (annotations/ + dirs)")
    p.add_argument("--ann-file", default="", help="override train annotation json")
    p.add_argument("--img-dir", default="", help="override train image dir")
    p.add_argument("--val-ann-file", default="")
    p.add_argument("--val-img-dir", default="")
    p.add_argument("--with-mask", action="store_true",
                   help="train/eval instance masks (Mask R-CNN only)")
    p.add_argument("--max-gt", type=int, default=48)
    p.add_argument("--fake-size", type=int, default=64,
                   help="FAKE dataset size (train and val)")
    p.add_argument("--eval-every", type=int, default=1, help="epochs; 0 = never")
    p.add_argument("--eval-max-images", type=int, default=0, help="0 = all")
    p.add_argument("--eval-score-thresh", type=float, default=0.05)
    p.add_argument("--init-ckpt", default="", help="classification ckpt (.pth)")
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from the latest checkpoint in output-dir")
    p.add_argument("--eval-only", action="store_true",
                   help="restore the latest checkpoint and run the AP eval only "
                        "(the /root/reference/detection/test.py role)")
    p.add_argument("--benchmark", type=int, default=0, metavar="ITERS",
                   help="measure inference images/sec over ITERS batches and exit "
                        "(the segmentation/tools/benchmark.py role)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE); preempted/restarted jobs "
                        "skip recompilation")
    p.add_argument("--output-dir", default="runs/det")
    if pre_args.preset:
        apply_preset(p, pre_args.preset)
    args = p.parse_args(argv)

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from recnext_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", None) or None)
    import optax
    import orbax.checkpoint as ocp

    from recnext_tpu.models.registry import get_config
    from recnext_tpu.tasks.detection import (
        RetinaNet,
        generate_anchors,
        init_backbone_from_classification,
        make_detection_train_step,
        retinanet_postprocess,
    )
    from recnext_tpu.tasks.mask_rcnn import MaskRCNN, mask_rcnn_loss
    from recnext_tpu.train.state import TrainState

    # ---- data -------------------------------------------------------------
    with_mask = args.with_mask and args.detector == "mask_rcnn"
    if args.data_set == "COCO":
        from recnext_tpu.data.coco import CocoDetection

        root = Path(args.data_path)
        ann = args.ann_file or str(root / "annotations/instances_train2017.json")
        img_dir = args.img_dir or str(root / "train2017")
        vann = args.val_ann_file or str(root / "annotations/instances_val2017.json")
        vimg = args.val_img_dir or str(root / "val2017")
        train_ds = CocoDetection(img_dir, ann, img_size=args.img_size,
                                 max_gt=args.max_gt, with_masks=with_mask,
                                 train=True, seed=args.seed)
        val_ds = (CocoDetection(vimg, vann, img_size=args.img_size,
                                max_gt=args.max_gt, with_masks=with_mask,
                                train=False)
                  if Path(vann).exists() else None)
        args.num_classes = train_ds.nb_classes
        steps_per_epoch = args.steps_per_epoch or max(
            1, len(train_ds) // args.batch_size)
    else:
        train_ds = FakeDetDataset(args.fake_size, args.img_size, args.num_classes,
                                  with_masks=with_mask, seed=args.seed)
        val_ds = FakeDetDataset(args.fake_size, args.img_size, args.num_classes,
                                with_masks=with_mask, seed=args.seed)
        steps_per_epoch = args.steps_per_epoch or 1000

    # ---- model + train step -----------------------------------------------
    cfg = get_config(args.backbone, num_classes=0)
    x0 = jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32)
    tx = optax.adamw(step_lr(args.lr, steps_per_epoch,
                             decay_epochs=tuple(args.decay_epochs)),
                     weight_decay=args.weight_decay)

    if args.detector == "retinanet":
        model = RetinaNet(backbone_cfg=cfg, num_classes=args.num_classes,
                          frozen_backbone_stats=False)
        variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0)
        feat_shapes = [(args.img_size // s, args.img_size // s)
                       for s in (4, 8, 16, 32, 64)]
        anchors = jnp.asarray(generate_anchors(feat_shapes,
                                               strides=(4, 8, 16, 32, 64)))
        train_step = jax.jit(make_detection_train_step(
            model, tx, anchors, num_classes=args.num_classes, seed=args.seed))

        num_anchor_shapes = 9  # 3 scales x 3 ratios (generate_anchors defaults)
        level_sizes = tuple(h * w * num_anchor_shapes for h, w in feat_shapes)

        @jax.jit
        def predict_fn(variables_, images):
            cls_scores, bbox_preds = model.apply(variables_, images, training=False)
            boxes, scores, labels, valid = jax.vmap(
                lambda c, bx: retinanet_postprocess(
                    c, bx, anchors, score_thresh=args.eval_score_thresh,
                    level_sizes=level_sizes)
            )(cls_scores, bbox_preds)
            return boxes, scores, labels, None, valid
    else:
        model = MaskRCNN(backbone_cfg=cfg, num_classes=args.num_classes,
                         num_proposals=args.num_proposals,
                         frozen_backbone_stats=False, with_mask=with_mask)
        variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0)

        def loss_fn(params, batch_stats, batch, rng):
            out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                                   batch["image"], training=True,
                                   gt_boxes=batch["gt_boxes"],
                                   gt_labels=batch["gt_labels"],
                                   mutable=["batch_stats"],
                                   rngs={"droppath": rng, "dropout": rng})
            loss, comps = mask_rcnn_loss(out, batch, num_classes=args.num_classes,
                                         return_components=True)
            return loss, (mut["batch_stats"], comps)

        @jax.jit
        def train_step(state, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), state.step)
            (loss, (new_bs, comps)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, **comps}
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_bs, opt_state=new_opt), metrics

        @jax.jit
        def predict_fn(variables_, images):
            return model.apply(variables_, images, method="predict",
                               score_thresh=args.eval_score_thresh)

    if args.init_ckpt:
        from recnext_tpu.convert import load_torch_checkpoint

        variables = init_backbone_from_classification(
            variables, load_torch_checkpoint(args.init_ckpt))

    state = TrainState.create(variables, tx, ema=False)

    # ---- checkpointing (orbax: last-3 + auto-resume) ------------------------
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    mgr = ocp.CheckpointManager(
        (out / "ckpt").absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=3))
    start_epoch = 0
    if (args.resume or args.eval_only) and mgr.latest_step() is not None:
        state = mgr.restore(mgr.latest_step(),
                            args=ocp.args.StandardRestore(jax.device_get(state)))
        start_epoch = int(mgr.latest_step()) + 1
        print(f"resumed from epoch {mgr.latest_step()}", flush=True)

    if args.benchmark:
        # Inference-throughput mode (segmentation/tools/benchmark.py:40-69
        # counterpart: warmup then timed iters). Chained dispatch + single drain
        # per the repo's tunnel-timing methodology (bench.py / PERF.md).
        variables_ = state.variables()

        @jax.jit
        def bstep(v, x):
            boxes, scores, *_ = predict_fn(v, x)
            return x + (0.0 * jnp.sum(scores)).astype(x.dtype)

        x = jnp.ones((args.batch_size, args.img_size, args.img_size, 3),
                     jnp.float32)
        x = bstep(variables_, x)
        float(jnp.sum(x[0, 0, 0]))  # compile + first exec
        t0 = time.time()
        for _ in range(args.benchmark):
            x = bstep(variables_, x)
        float(jnp.sum(x[0, 0, 0]))
        dt = time.time() - t0
        rec = {"detector": args.detector, "backbone": args.backbone,
               "img_size": args.img_size, "batch_size": args.batch_size,
               "iters": args.benchmark,
               "images_per_sec": round(args.benchmark * args.batch_size / dt, 2)}
        print(json.dumps(rec), flush=True)
        return rec

    if args.eval_only:
        # detection/test.py role: checkpoint -> AP numbers, no training.
        if mgr.latest_step() is None and not args.init_ckpt:
            raise SystemExit(f"--eval-only: no checkpoint under {out / 'ckpt'}")
        if val_ds is None:
            raise SystemExit("--eval-only: no validation dataset")
        stats = evaluate_detection(
            val_ds, lambda im: predict_fn(state.variables(), im),
            batch_size=args.batch_size, with_mask=with_mask,
            max_images=args.eval_max_images,
            score_thresh=args.eval_score_thresh)
        rec = {"epoch": start_epoch - 1,
               **{k: (round(v, 4) if np.isfinite(v) else None)
                  for k, v in stats.items()}}
        print(json.dumps(rec), flush=True)
        return rec

    # ---- loop ---------------------------------------------------------------
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        losses = []
        if args.data_set == "COCO":
            import itertools

            order = rng.permutation(len(train_ds))
            batches = itertools.islice(
                _det_batches(train_ds, order, args.batch_size), steps_per_epoch)
        else:
            batches = (synthetic_det_batch(rng, args.batch_size, args.img_size,
                                           args.num_classes, with_masks=with_mask)
                       for _ in range(steps_per_epoch))
        for batch in batches:
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("image", "gt_boxes", "gt_labels", "gt_masks")}
            state, metrics = train_step(state, jb)
            # keep metrics as device arrays: a float() here would block on a
            # host round-trip per step and serialize dispatch over the tunnel
            # RTT (CLAUDE.md measurement pitfalls); fetch once per epoch below
            losses.append(metrics)
        losses = [{k: float(v) for k, v in m.items()}
                  for m in jax.device_get(losses)]
        comp_means = {k: round(float(np.mean([l[k] for l in losses])), 4)
                      for k in losses[0] if k != "loss"} if losses else {}
        losses = [l["loss"] for l in losses]
        rec = {"epoch": epoch, "train_loss": float(np.mean(losses)), **comp_means,
               "elapsed_s": round(time.time() - t0, 1)}

        if val_ds is not None and args.eval_every and \
                (epoch + 1) % args.eval_every == 0:
            stats = evaluate_detection(
                val_ds,
                lambda im: predict_fn(state.variables(), im),
                batch_size=args.batch_size, with_mask=with_mask,
                max_images=args.eval_max_images,
                score_thresh=args.eval_score_thresh)
            # NaN = "no gt in this area range"; JSON has no NaN literal -> null
            rec.update({k: (round(v, 4) if np.isfinite(v) else None)
                        for k, v in stats.items()})

        mgr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)))
        print(json.dumps(rec), flush=True)
        with open(out / "log.txt", "a") as f:
            f.write(json.dumps(rec) + "\n")
        if not np.isfinite(rec["train_loss"]):
            raise SystemExit(f"Loss is {rec['train_loss']}, stopping")
    mgr.wait_until_finished()
    return state


if __name__ == "__main__":
    main()
