"""Semantic-segmentation training CLI — the counterpart of the reference's mmseg
harness (/root/reference/segmentation/tools/train.py + Semantic FPN configs:
AdamW lr 1e-4 wd 0.05, poly lr power 0.9 min 1e-6, 40k iters, eval mIoU every 8k,
frozen-BN backbone init from a classification checkpoint).

Smoke: python -m recnext_tpu.tasks.train_seg --backbone recnext_m3 --data-set FAKE \
    --iters 20 --eval-every 10 --crop 128 --batch-size 4

Orbax checkpoints (last-3) are written every --ckpt-every iters (default: at
every eval); `--resume` continues a preempted run, `--eval-only` reports mIoU
from the latest checkpoint (segmentation/tools/test.py role), and
`--benchmark N` measures inference images/sec (segmentation/tools/benchmark.py
role).

Reading the numbers: the per-eval "loss" is a SINGLE batch's loss — with
mostly-ignore crops it spikes to 2-5x the running mean, so judge convergence by
the trend. On tiny FOLDER datasets the val mIoU is a macro mean over classes,
and a class with one or two held-out instances swings it by whole tens of
points (diagnosed in round 2: train mean 0.47 with val mIoU 48 where 5/7
classes sat at 0.6-0.8 and one rare class at 0). The committed learning
evidence uses the FAKE stream (examples/logs/fake_seg_semfpn_m0_tpu.log,
mIoU 95) where every eval sees all classes.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def poly_schedule(base_lr: float, total_iters: int, power: float = 0.9,
                  min_lr: float = 1e-6):
    def sched(step):
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        return (base_lr - min_lr) * (1.0 - t) ** power + min_lr

    return sched


def synthetic_seg_batch(rng: np.random.Generator, batch: int, crop: int,
                        num_classes: int):
    """Learnable synthetic scenes: a class-colored disc on noise (the class id
    determines the disc color, like the detection generator), so the task has
    actual signal and mIoU measures learning rather than the background prior."""
    img = rng.normal(scale=0.3, size=(batch, crop, crop, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:crop, 0:crop]
    masks = []
    for b in range(batch):
        cx, cy = rng.integers(0, crop, 2)
        r = rng.integers(crop // 8, crop // 2)
        cls = int(rng.integers(1, num_classes))
        inside = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        color = np.random.default_rng(cls).uniform(-1.5, 1.5, 3)
        img[b][inside] = color + rng.normal(scale=0.1, size=(int(inside.sum()), 3))
        m = np.zeros((crop, crop), np.int32)
        m[inside] = cls
        masks.append(m)
    return {"image": img, "label": np.stack(masks)}


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--preset", default="",
                     help="named recipe from tasks/configs.py, e.g. "
                          "seg_recnext_a3_fpn_ade20k_40k")
    pre_args, argv = pre.parse_known_args(argv)
    p = argparse.ArgumentParser("Semantic FPN training")
    p.add_argument("--backbone", default="recnext_m3")
    p.add_argument("--num-classes", type=int, default=150)
    p.add_argument("--iters", type=int, default=40000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--crop", type=int, default=512)
    p.add_argument("--eval-every", type=int, default=8000)
    p.add_argument("--data-set", default="FAKE", choices=["FAKE", "FOLDER"],
                   help="FOLDER = ADE20K-style images/ + annotations/ layout")
    p.add_argument("--data-path", default="")
    p.add_argument("--init-ckpt", default="", help="classification ckpt (.pth/orbax)")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="checkpoint interval in iters (0 = at every eval)")
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from the latest checkpoint in output-dir")
    p.add_argument("--eval-only", action="store_true",
                   help="restore the latest checkpoint and report mIoU only "
                        "(the segmentation/tools/test.py role)")
    p.add_argument("--benchmark", type=int, default=0, metavar="ITERS",
                   help="measure inference images/sec over ITERS batches and exit "
                        "(the segmentation/tools/benchmark.py role)")
    p.add_argument("--output-dir", default="runs/seg")
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE)")
    p.add_argument("--dtype", default="float32", choices=["bfloat16", "float32"])
    if pre_args.preset:
        # named recipe from tasks/configs.py (the mm config-file counterpart);
        # explicit CLI flags still override
        from recnext_tpu.tasks.configs import SEGMENTATION_CONFIGS

        if pre_args.preset not in SEGMENTATION_CONFIGS:
            raise SystemExit(f"unknown preset {pre_args.preset!r}; "
                             f"known: {sorted(SEGMENTATION_CONFIGS)}")
        c = SEGMENTATION_CONFIGS[pre_args.preset]
        p.set_defaults(backbone=c["backbone"], lr=c["lr"],
                       weight_decay=c["weight_decay"], iters=c["iters"],
                       batch_size=c["batch_size"], num_classes=c["num_classes"],
                       crop=c["crop"], eval_every=c["eval_every"])
    args = p.parse_args(argv)

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from recnext_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", None) or None)
    import optax

    from recnext_tpu.models.registry import get_config
    from recnext_tpu.tasks.segmentation import SemanticFPN, miou, segmentation_loss
    from recnext_tpu.train.state import TrainState

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = get_config(args.backbone, num_classes=0)
    model = SemanticFPN(backbone_cfg=cfg, num_classes=args.num_classes, dtype=dtype)
    x0 = jnp.zeros((1, args.crop, args.crop, 3), dtype)
    variables = model.init(jax.random.PRNGKey(0), x0)

    if args.init_ckpt:
        from recnext_tpu.convert import load_torch_checkpoint
        from recnext_tpu.tasks.detection import init_backbone_from_classification

        cls_vars = load_torch_checkpoint(args.init_ckpt)
        variables = init_backbone_from_classification(variables, cls_vars)

    tx = optax.adamw(poly_schedule(args.lr, args.iters), weight_decay=args.weight_decay)
    state = TrainState.create(variables, tx, ema=False)

    def loss_fn(params, batch_stats, batch, rng):
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            training=True, mutable=["batch_stats"],
            rngs={"dropout": rng, "droppath": rng})
        return segmentation_loss(logits, batch["label"]), mut["batch_stats"]

    @jax.jit
    def train_step(state, batch, rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats, opt_state=new_opt), loss

    @jax.jit
    def eval_step(state, batch):
        logits = model.apply(state.variables(), batch["image"], training=False)
        return miou(logits, batch["label"], args.num_classes)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # orbax checkpointing (the mmseg runner's CheckpointHook role: periodic
    # save, last-3 window, auto-resume for preempted 40k-iter runs)
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(
        (out / "ckpt").absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=3))
    start_iter = 0
    if (args.resume or args.eval_only) and mgr.latest_step() is not None:
        state = mgr.restore(mgr.latest_step(),
                            args=ocp.args.StandardRestore(jax.device_get(state)))
        start_iter = int(mgr.latest_step())
        print(f"resumed at iter {start_iter}", flush=True)
    ckpt_every = args.ckpt_every or args.eval_every

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    seg_ds = val_ds = None
    if args.data_set == "FOLDER":
        from recnext_tpu.data.datasets import SegFolder
        from recnext_tpu.tasks.segmentation import seg_eval_sample, seg_train_sample

        if not args.data_path:
            raise SystemExit("--data-set FOLDER requires --data-path")
        seg_ds = SegFolder(args.data_path, split="training")
        if len(seg_ds) == 0:
            raise SystemExit(
                f"no image/annotation pairs under {args.data_path}/images/training "
                f"+ annotations/training — check --data-path")
        try:
            val_ds = SegFolder(args.data_path, split="validation")
            if len(val_ds) == 0:
                val_ds = None
        except Exception:
            val_ds = None

        def next_batch(rng):
            imgs, segs = [], []
            for _ in range(args.batch_size):
                img, seg = seg_ds[int(rng.integers(len(seg_ds)))]
                a, s = seg_train_sample(rng, img, seg, args.crop)
                imgs.append(a)
                segs.append(s)
            return {"image": np.stack(imgs), "label": np.stack(segs)}
    else:
        def next_batch(rng):
            return synthetic_seg_batch(rng, args.batch_size, args.crop,
                                       args.num_classes)

    def val_miou(state):
        """mmseg-style eval over the validation split (fixed-shape center-crop
        samples so the jitted eval step compiles once); global inter/union."""
        from recnext_tpu.tasks.segmentation import seg_eval_sample

        inter_t = np.zeros(args.num_classes)
        union_t = np.zeros(args.num_classes)
        n = len(val_ds)
        for start in range(0, n, args.batch_size):
            idx = list(range(start, min(start + args.batch_size, n)))
            pad = args.batch_size - len(idx)
            samples = [seg_eval_sample(*val_ds[i], args.crop) for i in idx]
            imgs = np.stack([a for a, _ in samples] + [samples[0][0]] * pad)
            segs = np.stack([s for _, s in samples]
                            + [np.full_like(samples[0][1], 255)] * pad)
            inter, union = eval_step(state, {"image": jnp.asarray(imgs),
                                             "label": jnp.asarray(segs)})
            inter_t += np.asarray(inter)
            union_t += np.asarray(union)
        seen = union_t > 0
        return float(np.mean(inter_t[seen] / union_t[seen])) if seen.any() else 0.0

    def measure_miou(state, batch):
        if val_ds is not None:
            return val_miou(state)  # mmseg role: mIoU over the validation split
        inter, union = eval_step(state, batch)
        inter, union = np.asarray(inter), np.asarray(union)
        seen = union > 0
        return float(np.mean(inter[seen] / union[seen])) if seen.any() else 0.0

    if args.benchmark:
        # Inference-throughput mode (segmentation/tools/benchmark.py:40-69
        # counterpart). Chained dispatch + single drain per the repo's
        # tunnel-timing methodology (bench.py / PERF.md).
        variables_ = state.variables()

        @jax.jit
        def bstep(v, x):
            logits = model.apply(v, x, training=False)
            return x + (0.0 * jnp.sum(logits)).astype(x.dtype)

        x = jnp.ones((args.batch_size, args.crop, args.crop, 3), dtype)
        x = bstep(variables_, x)
        float(jnp.sum(x[0, 0, 0]))  # compile + first exec
        t0 = time.time()
        for _ in range(args.benchmark):
            x = bstep(variables_, x)
        float(jnp.sum(x[0, 0, 0]))
        dt = time.time() - t0
        rec = {"backbone": args.backbone, "crop": args.crop,
               "batch_size": args.batch_size, "iters": args.benchmark,
               "images_per_sec": round(args.benchmark * args.batch_size / dt, 2)}
        print(json.dumps(rec), flush=True)
        return rec

    if args.eval_only:
        # segmentation/tools/test.py role: checkpoint -> mIoU, no training.
        if mgr.latest_step() is None and not args.init_ckpt:
            raise SystemExit(f"--eval-only: no checkpoint under {out / 'ckpt'}")
        batch = None
        if val_ds is None:  # FAKE: fixed seeded eval batch
            batch = {k: jnp.asarray(v)
                     for k, v in next_batch(np.random.default_rng(1)).items()}
        m = measure_miou(state, batch)
        rec = {"iter": start_iter, "mIoU": round(100 * m, 2)}
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.time()
    for it in range(start_iter, args.iters):
        batch = next_batch(rng_np)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = train_step(state, batch, jax.random.fold_in(key, it))
        if (it + 1) % args.eval_every == 0 or it + 1 == args.iters:
            m = measure_miou(state, batch)
            rec = {"iter": it + 1, "loss": float(loss), "mIoU": round(100 * m, 2),
                   "elapsed_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            with open(out / "log.txt", "a") as f:
                f.write(json.dumps(rec) + "\n")
            if not np.isfinite(float(loss)):
                raise SystemExit(f"Loss is {float(loss)}, stopping")
        if (it + 1) % ckpt_every == 0 or it + 1 == args.iters:
            mgr.save(it + 1, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    return state


if __name__ == "__main__":
    main()
