"""ImageNet/CIFAR training CLI — the `python main.py` counterpart
(/root/reference/main.py:30-468), TPU-native:

* ONE jitted train step over a ("data","fsdp") mesh (no DDP wrapper, no loss scaler);
  bf16 compute / fp32 params by default.
* RepViT/DeiT recipe defaults: AdamW lr 1e-3 x batch/512, wd 0.025, AGC clip 0.02,
  cosine over the full 300 epochs + 5 warmup (reference-log-exact; --cooldown-epochs
  appends extra min_lr epochs), mixup/cutmix, label smoothing 0.1,
  RandAugment, EMA 0.99996, hard distillation (dual head).
* orbax checkpointing of the full TrainState (keeps last 3 + best, like
  main.py:419-447), per-epoch JSONL log with the reference's key names so the
  log-replay validation pattern (SURVEY.md §4.2) works unchanged.

Smoke-test config (the dist_train_cifar.sh counterpart):
  python -m recnext_tpu.train.main --model recnext_m0 --data-set FAKE --epochs 1 \
      --batch-size 32 --input-size 64 --steps-per-epoch 4 --output-dir /tmp/run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    """Two-stage parser: an optional --config YAML provides defaults, CLI overrides —
    the timm-style config system of the alternate trainer
    (/root/reference/moganet_train.py:78-347)."""
    cfg_parser = argparse.ArgumentParser(add_help=False)
    cfg_parser.add_argument("--config", default="", help="YAML config with arg defaults")
    cfg_args, remaining = cfg_parser.parse_known_args(argv)

    p = argparse.ArgumentParser("RecNext TPU training", parents=[cfg_parser])
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--model-kwargs", default="",
                   help="comma-separated RecNextConfig overrides for ablation "
                        "recipes (logs/ablation/*), e.g. "
                        "recconv_kernel_size=3,recconv_mode=nearest,"
                        "attn_kernel=relu")
    p.add_argument("--batch-size", type=int, default=256, help="global batch")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--input-size", type=int, default=224)
    # optimization (reference defaults, main.py:52-91)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.025)
    p.add_argument("--clip-grad", type=float, default=0.02, help="gradient clip value")
    p.add_argument("--clip-mode", default="agc", choices=["agc", "norm"],
                   help="'agc' = adaptive clip (RecNeXt recipe, main.py:58-61); "
                        "'norm' = global-norm clip (MLLA/Swin recipe, "
                        "TRAIN.CLIP_GRAD 5.0 in mlla/logs/*/01_baseline.txt)")
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--cooldown-epochs", type=int, default=0,
                   help="EXTRA epochs at min_lr appended after the cosine cycle "
                        "(timm num_epochs convention). The reference defaults "
                        "this to 10 but its loop discards the extension "
                        "(main.py:400), so de-facto reference behavior is 0.")
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-5)
    # augmentation
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--ThreeAugment", action="store_true")
    p.add_argument("--simple-aug", action="store_true",
                   help="RRC+flip+normalize only (no RA/jitter/erasing)")
    p.add_argument("--fake-classes", type=int, default=1000)
    p.add_argument("--aa-magnitude", type=float, default=9.0)
    p.add_argument("--no-aa", action="store_true",
                   help="disable RandAugment (the reference's --aa ''); per "
                        "timm create_transform, color jitter then applies")
    p.add_argument("--color-jitter", type=float, default=0.4)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--no-repeated-aug", action="store_true")
    p.add_argument("--jsd-loss", action="store_true",
                   help="JSD consistency loss over --aug-splits views "
                        "(moganet --jsd-loss counterpart)")
    p.add_argument("--aug-splits", type=int, default=0,
                   help="augmentation splits per batch (0/1 = off); split 0 is "
                        "the clean view")
    # distillation (losses.py defaults via main.py:96-104)
    p.add_argument("--distillation-type", default="none", choices=["none", "hard", "soft"])
    p.add_argument("--distillation-alpha", type=float, default=0.5)
    p.add_argument("--distillation-tau", type=float, default=1.0)
    p.add_argument("--teacher-ckpt", default="", help="orbax dir or .pth for the teacher")
    p.add_argument("--teacher-model", default="", help="registry name of the teacher")
    # EMA
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    p.add_argument("--no-model-ema", action="store_true")
    # MESA self-distillation (the MLLA harness's AUG.MESA, mlla/cfgs/*.yaml:14 —
    # every committed MLLA ablation log trains with MESA 1.0)
    p.add_argument("--mesa", type=float, default=0.0,
                   help="weight of the EMA-teacher self-distillation loss "
                        "(softCE vs the EMA model's softmax); 0 = off")
    p.add_argument("--mesa-start-ratio", type=float, default=0.25,
                   help="fraction of total epochs after which MESA activates "
                        "(upstream MLLA harness convention)")
    # finetuning (reference main.py:145-148; load semantics main.py:278-294)
    p.add_argument("--finetune", default="",
                   help="warm-start model weights from a checkpoint (orbax dir, "
                        ".msgpack, torch .pth raw, or published *_fused.pt); "
                        "shape-mismatched head leaves are dropped — the 384² "
                        "finetune + CIFAR/FLOWERS/iNat transfer entry")
    p.add_argument("--set-bn-eval", action="store_true",
                   help="freeze BatchNorm during finetuning (running stats in "
                        "the forward, no stat updates) — reference --set_bn_eval")
    # data
    p.add_argument("--data-set", default="IMNET",
                   choices=["IMNET", "CIFAR", "FOLDER", "FAKE",
                            "IMNETEE", "FLOWERS", "INAT", "INAT19"])
    p.add_argument("--data-path", default="")
    p.add_argument("--native-loader", action="store_true",
                   help="C++ fused decode+RandomResizedCrop+flip train path and "
                        "fused bicubic eval path (PIL-parity; ImageFolder only, "
                        "falls back to PIL when unavailable)")
    p.add_argument("--loader", default="thread", choices=["thread", "grain"],
                   help="input pipeline: in-process thread prefetcher, or grain "
                        "with worker processes (production ImageNet path; no "
                        "repeated-aug sampling)")
    p.add_argument("--workers", type=int, default=8,
                   help="grain worker processes (--loader grain only)")
    p.add_argument("--output-dir", default="runs/default")
    p.add_argument("--resume", default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval-ema", action="store_true")
    p.add_argument("--no-fused-eval", action="store_true",
                   help="run per-epoch eval through the raw (unfused) model "
                        "like the reference's engine.py:78-109, instead of the "
                        "default BN-fused (+lane-packed) deployment graph "
                        "(~25%% faster per eval forward, PERF.md)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE); preempted/restarted jobs "
                        "skip recompilation")
    # system
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient accumulation steps (optax.MultiSteps)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in backprop (jax.checkpoint)")
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="truncate each epoch (smoke tests); 0 = full epoch")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every-steps", type=int, default=0,
                   help="mid-epoch recovery checkpoint interval "
                        "(moganet save_recovery counterpart); 0 = off")
    p.add_argument("--export-teacher", default="",
                   help="after training, save final model variables (EMA if "
                        "enabled) via orbax StandardCheckpointer to this dir — "
                        "loadable as --teacher-ckpt")
    p.add_argument("--wandb", action="store_true",
                   help="log to wandb if installed (reference main.py:192-200)")
    # multi-host (jax.distributed; the torchrun/SLURM init of utils.py:202-224)
    p.add_argument("--dist-coordinator", default="",
                   help="coordinator host:port; enables jax.distributed.initialize")
    p.add_argument("--dist-num-processes", type=int, default=0)
    p.add_argument("--dist-process-id", type=int, default=-1)
    if cfg_args.config:
        import yaml

        with open(cfg_args.config) as f:
            defaults = yaml.safe_load(f) or {}
        known = {a.dest for a in p._actions}
        unknown = set(defaults) - known
        if unknown:
            raise SystemExit(f"unknown config keys: {sorted(unknown)}")
        p.set_defaults(**defaults)
    return p.parse_args(remaining)


def main(argv=None):
    args = parse_args(argv)
    # honor JAX_PLATFORMS even when a site hook pre-pinned another platform
    import os

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from recnext_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", None) or None)
    # multi-host bring-up BEFORE any JAX backend use (utils.py:202-224 counterpart)
    from recnext_tpu.parallel import init_distributed

    init_distributed(coordinator=args.dist_coordinator,
                     num_processes=args.dist_num_processes,
                     process_id=args.dist_process_id)
    import optax
    import orbax.checkpoint as ocp

    from recnext_tpu.data.datasets import build_dataset
    from recnext_tpu.data.loader import eval_loader, train_loader
    from recnext_tpu.data.transforms import (
        EvalTransform,
        SimpleTrainTransform,
        TrainTransform,
    )
    from recnext_tpu.models.registry import create_model
    from recnext_tpu.parallel import (
        batch_sharding,
        make_mesh,
        put_batch,
        replicated,
        state_sharding,
    )
    from recnext_tpu.train.optim import cosine_schedule, make_optimizer, scaled_lr
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_eval_step, make_train_step

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    is_main = jax.process_index() == 0
    if is_main:  # args.yaml dump (moganet_train.py:683-684 counterpart)
        import yaml

        (out_dir / "args.yaml").write_text(
            yaml.safe_dump({k: v for k, v in vars(args).items()}))

    def log(msg):
        if is_main:
            print(msg, flush=True)

    wandb_run = None
    if args.wandb and is_main:
        try:
            import wandb

            wandb_run = wandb.init(project="recnext_tpu", config=vars(args))
        except Exception:
            log("wandb requested but unavailable; continuing without it")

    if args.mesa > 0 and args.no_model_ema:
        raise SystemExit("--mesa needs the EMA model as its teacher "
                         "(drop --no-model-ema)")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mesh = make_mesh(fsdp=args.fsdp)
    n_dev = mesh.devices.size
    log(f"mesh: {mesh.shape}, devices: {n_dev}, processes: {jax.process_count()}")

    train_ds, nb_classes = build_dataset(True, args.data_set, args.data_path,
                                         args.input_size, args.fake_classes)
    val_ds, _ = build_dataset(False, args.data_set, args.data_path,
                              args.input_size, args.fake_classes)

    distill = args.distillation_type != "none"
    if args.model.startswith("regnet"):
        # train the teacher family directly (reference teacher = timm regnety_160,
        # main.py:336-352); used to pre-train a FAKE-data teacher where the
        # published ckpt is unreachable (zero egress, PARITY.md)
        if distill:
            raise SystemExit("regnet students have no distillation head")
        from recnext_tpu.models.regnet import create_regnet

        model = create_regnet(args.model, num_classes=nb_classes, dtype=dtype)
    elif args.model.startswith("mlla"):
        # the MLLA graft ablation family trains through the same jitted step
        # (the reference trains it with a separate Swin-style harness,
        # mlla/cfgs/*.yaml; recipe presets in configs/mlla_*.yaml)
        if distill:
            raise SystemExit("mlla models have no distillation head; "
                             "use --mesa for the MLLA recipe's self-distillation")
        from recnext_tpu.models.mlla import create_mlla
        from recnext_tpu.models.registry import parse_kv_overrides

        model = create_mlla(args.model, num_classes=nb_classes, dtype=dtype,
                            **parse_kv_overrides(args.model_kwargs))
    else:
        from recnext_tpu.models.registry import parse_kv_overrides

        model = create_model(args.model, num_classes=nb_classes,
                             distillation=distill, dtype=dtype,
                             frozen_stats=args.set_bn_eval,
                             **parse_kv_overrides(args.model_kwargs))
    if args.set_bn_eval and args.model.startswith(("regnet", "mlla")):
        raise SystemExit("--set-bn-eval is a RecNext-family finetune knob")
    x0 = jnp.zeros((1, args.input_size, args.input_size, 3), dtype)
    # jit the init: un-jitted init over the remote-TPU tunnel is thousands of ~2ms
    # dispatches (minutes); one compiled program instead (PERF.md)
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0)
    if args.finetune:
        # weights-only warm start; optimizer/schedule/epoch start fresh
        # (reference --finetune, main.py:278-294 — vs --resume's full restore)
        from recnext_tpu.models.registry import get_config as _get_cfg
        from recnext_tpu.train.finetune import load_pretrained

        fam = ("m" if args.model.startswith(("regnet", "mlla"))
               else _get_cfg(args.model).family)
        variables = jax.tree.map(
            jnp.asarray,
            load_pretrained(args.finetune, jax.device_get(variables),
                            family=fam, log=log))
    n_parameters = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    log(f"model {args.model}: {n_parameters/1e6:.2f}M params, {nb_classes} classes")

    steps_per_epoch = args.steps_per_epoch or max(len(train_ds) // args.batch_size, 1)
    lr = scaled_lr(args.lr, args.batch_size)
    sched = cosine_schedule(lr, steps_per_epoch, args.epochs, args.warmup_epochs,
                            args.cooldown_epochs, args.warmup_lr, args.min_lr)
    # under optax.MultiSteps the inner schedule advances once per k micro-steps,
    # so the optimizer's copy must count UPDATES, not micro-steps — otherwise
    # the applied schedule runs k times too slowly. Map update count back to
    # micro-steps (exact for any steps_per_epoch, no floor-division drift).
    sched_opt = (sched if args.grad_accum <= 1
                 else (lambda u: sched(u * args.grad_accum)))
    tx = make_optimizer(sched_opt, args.weight_decay, args.clip_grad,
                        grad_accum=args.grad_accum, clip_mode=args.clip_mode)
    state = TrainState.create(variables, tx, ema=not args.no_model_ema)

    teacher_apply = None
    if distill:
        if args.teacher_model:
            is_regnet = args.teacher_model.startswith("regnet")
            if is_regnet:
                # the reference recipe's teacher: timm regnety_160 (main.py:336-352)
                from recnext_tpu.models.regnet import create_regnet

                teacher = create_regnet(args.teacher_model,
                                        num_classes=nb_classes, dtype=dtype)
            else:
                teacher = create_model(args.teacher_model, num_classes=nb_classes, dtype=dtype)
            if args.teacher_ckpt.endswith((".pth", ".pt")):
                import torch

                from recnext_tpu.convert import regnety_torch_to_flax, torch_to_flax

                tstate = torch.load(args.teacher_ckpt, map_location="cpu",
                                    weights_only=False)
                tvars = (regnety_torch_to_flax(tstate) if is_regnet
                         else torch_to_flax(tstate))
            elif args.teacher_ckpt.endswith(".msgpack"):
                from flax import serialization

                with open(args.teacher_ckpt, "rb") as f:
                    tvars = serialization.msgpack_restore(f.read())
            elif args.teacher_ckpt:
                tvars = ocp.StandardCheckpointer().restore(args.teacher_ckpt)
            else:
                tvars = jax.jit(teacher.init)(jax.random.PRNGKey(1), x0)
            teacher_apply = lambda xb: teacher.apply(tvars, xb, training=False)
        else:
            raise SystemExit("--distillation-type requires --teacher-model")

    # mixup/cutmix ablation semantics: either alpha 0 disables that branch alone
    # (switch_prob routes everything to the remaining one); both 0 disables mixing.
    use_mix = args.mixup > 0 or args.cutmix > 0
    if args.mixup > 0 and args.cutmix > 0:
        switch_prob = 0.5
    else:
        switch_prob = 1.0 if args.cutmix > 0 else 0.0
    if args.jsd_loss:
        if args.aug_splits < 2:
            raise SystemExit("--jsd-loss requires --aug-splits >= 2")
        if distill:
            raise SystemExit("--jsd-loss is incompatible with distillation")
        use_mix = False
    train_step = make_train_step(
        model, tx, num_classes=nb_classes, teacher_apply=teacher_apply,
        mesa=args.mesa,
        mesa_start_step=int(args.mesa_start_ratio * args.epochs * steps_per_epoch),
        distillation=args.distillation_type, alpha=args.distillation_alpha,
        tau=args.distillation_tau, mixup=use_mix,
        jsd_splits=args.aug_splits if args.jsd_loss else 0,
        mixup_kwargs=dict(mixup_alpha=max(args.mixup, 1e-8),
                          cutmix_alpha=max(args.cutmix, 1e-8),
                          switch_prob=switch_prob),
        smoothing=args.smoothing, ema_decay=args.model_ema_decay, remat=args.remat,
        grad_accum=args.grad_accum,
    )
    # Per-epoch eval defaults to the BN-fused deployment graph (+ the lane-
    # packed executor for m/a): fuse_params(xp=jnp) traces into the jitted eval
    # step (no host round-trip) and the forward is measured ~25% faster than
    # the reference's unfused eval (engine.py:78-109). --no-fused-eval restores
    # the reference behavior; the regnet teacher family has no fused form.
    use_fused_eval = (not args.no_fused_eval
                      and not args.model.startswith(("regnet", "mlla")))
    if use_fused_eval:
        from recnext_tpu.models.registry import get_config
        from recnext_tpu.train.step import make_fused_eval_step

        eval_cfg = get_config(args.model, num_classes=nb_classes,
                              distillation=distill,
                              **parse_kv_overrides(args.model_kwargs))
        fused_eval_model = None
        if eval_cfg.family not in ("m", "a"):
            fused_eval_model = create_model(
                args.model, num_classes=nb_classes, fused=True, dtype=dtype,
                **parse_kv_overrides(args.model_kwargs))
        mk_eval = lambda ema: make_fused_eval_step(
            eval_cfg, ema=ema, fused_model=fused_eval_model, dtype=dtype)
    else:
        mk_eval = lambda ema: make_eval_step(model, ema=ema)
    eval_step = mk_eval(args.eval_ema)

    st_sh = state_sharding(state, mesh)
    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    state = jax.device_put(state, st_sh)
    jitted_train = jax.jit(train_step,
                           in_shardings=(st_sh, {"image": b_sh, "label": b_sh}, r_sh),
                           out_shardings=(st_sh, r_sh), donate_argnums=(0,))
    jitted_eval = jax.jit(eval_step, in_shardings=(st_sh, {"image": b_sh, "label": b_sh}),
                          out_shardings=r_sh)
    # per-epoch EMA-vs-raw tracking (timm --model-ema-eval counterpart): a second
    # compiled eval over the EMA weights, logged as ema_test_acc* so long runs
    # show the EMA>=raw crossover in the committed JSONL
    jitted_eval_ema = None
    if not args.no_model_ema and not args.eval_ema and not args.eval:
        jitted_eval_ema = jax.jit(
            mk_eval(True),
            in_shardings=(st_sh, {"image": b_sh, "label": b_sh}),
            out_shardings=r_sh)

    mgr = ocp.CheckpointManager(
        out_dir.resolve() / "ckpt",
        options=ocp.CheckpointManagerOptions(
            max_to_keep=3, best_fn=lambda m: m.get("acc1", 0.0), keep_period=None),
    )
    start_epoch = 0
    if args.resume:
        target = jax.tree.map(np.asarray, jax.device_get(state))
        restored = ocp.StandardCheckpointer().restore(
            Path(args.resume).resolve(), target=target)
        state = jax.device_put(restored, st_sh)
        start_epoch = int(np.asarray(state.step)) // steps_per_epoch
        log(f"resumed from {args.resume} at epoch {start_epoch}")
    elif mgr.latest_step() is not None:
        target = jax.tree.map(np.asarray, jax.device_get(state))
        state = jax.device_put(
            mgr.restore(mgr.latest_step(),
                        args=ocp.args.StandardRestore(target)), st_sh)
        start_epoch = mgr.latest_step() + 1
        log(f"auto-resumed at epoch {start_epoch}")

    n_proc = jax.process_count()
    local_devices = max(n_dev // n_proc, 1)

    def run_evals(*eval_fns):
        """Eval split strided by process; correct/loss/count are summed INSIDE the
        jitted step (global psum), so every process reads identical totals.
        Multiple eval fns (raw + EMA weights) score each decoded batch in ONE
        pass — host-side decode gates eval wall time on small hosts, so the
        split must not be re-decoded per weight set."""
        tots = [{"correct1": 0, "correct5": 0, "count": 0, "loss_sum": 0.0}
                for _ in eval_fns]
        loader = eval_loader(val_ds, EvalTransform(args.input_size),
                             batch_size=max(args.batch_size // n_proc, 1),
                             rank=jax.process_index(), num_replicas=n_proc,
                             native=args.native_loader)
        for i, batch in enumerate(iter(loader)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            if batch["image"].shape[0] % local_devices != 0:  # pad ragged tail
                pad = local_devices - batch["image"].shape[0] % local_devices
                pad_img = np.zeros((pad,) + batch["image"].shape[1:],
                                   batch["image"].dtype)
                batch = {
                    "image": np.concatenate([batch["image"], pad_img]),
                    "label": np.concatenate([batch["label"], np.full((pad,), -1, np.int32)]),
                }
            dev_batch = put_batch(batch, b_sh)
            for tot, eval_fn in zip(tots, eval_fns):
                m = eval_fn(state, dev_batch)
                tot["correct1"] += int(m["correct1"])
                tot["correct5"] += int(m["correct5"])
                tot["loss_sum"] += float(m["loss_sum"])
                tot["count"] += int(m["count"])
        return [(100.0 * t["correct1"] / max(t["count"], 1),
                 100.0 * t["correct5"] / max(t["count"], 1),
                 t["loss_sum"] / max(t["count"], 1)) for t in tots]

    def run_eval():
        return run_evals(jitted_eval)[0]

    if args.eval:
        acc1, acc5, test_loss = run_eval()
        log(json.dumps({"test_loss": test_loss, "test_acc1": acc1,
                        "test_acc5": acc5}))
        return {"acc1": acc1, "acc5": acc5, "test_loss": test_loss}

    key = jax.device_put(jax.random.PRNGKey(args.seed), r_sh)
    max_acc = 0.0
    if args.simple_aug:
        tt = SimpleTrainTransform(args.input_size)
    else:
        tt = TrainTransform(args.input_size, three_augment=args.ThreeAugment,
                            auto_augment=not args.no_aa,
                            ra_magnitude=args.aa_magnitude, jitter=args.color_jitter,
                            reprob=args.reprob)
    for epoch in range(start_epoch, args.epochs + args.cooldown_epochs):
        t0 = time.time()
        if args.loader == "grain":
            from recnext_tpu.data.grain_loader import build_grain_loader

            loader = build_grain_loader(
                train_ds, tt, batch_size=max(args.batch_size // n_proc, 1),
                seed=args.seed + epoch, shuffle=True, num_epochs=1,
                worker_count=args.workers, rank=jax.process_index(),
                num_replicas=n_proc)
        else:
            splits = args.aug_splits if args.jsd_loss else 0
            local_bs = max(args.batch_size // n_proc, 1)
            loader = train_loader(train_ds, tt,
                                  batch_size=(local_bs // splits if splits > 1
                                              else local_bs),
                                  epoch=epoch, rank=jax.process_index(),
                                  num_replicas=n_proc,
                                  repeated_aug=not args.no_repeated_aug,
                                  seed=args.seed, aug_splits=splits,
                                  clean_transform=SimpleTrainTransform(
                                      args.input_size) if splits > 1 else None,
                                  native=args.native_loader)
        losses, seen = [], 0
        for i, batch in enumerate(iter(loader)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            state, metrics = jitted_train(state, put_batch(batch, b_sh), key)
            if (i + 1) % args.log_every == 0:
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    raise SystemExit(f"Loss is {loss}, stopping training")  # engine.py:54-56
                log(f"epoch {epoch} step {i+1}: loss {loss:.4f}")
            losses.append(metrics["loss"])
            seen += args.batch_size
            if args.ckpt_every_steps and (i + 1) % args.ckpt_every_steps == 0:
                rec = out_dir.resolve() / "recovery"
                ckptr = ocp.StandardCheckpointer()
                if rec.exists():
                    import shutil

                    shutil.rmtree(rec)
                ckptr.save(rec, jax.device_get(state))
                ckptr.wait_until_finished()
                log(f"recovery checkpoint at epoch {epoch} step {i+1}")
        train_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")
        if not np.isfinite(train_loss):
            raise SystemExit(f"Loss is {train_loss}, stopping training")

        ema_stats = {}
        if jitted_eval_ema is not None:
            # one decode pass scores both weight sets
            (acc1, acc5, test_loss), (ema_acc1, ema_acc5, _) = run_evals(
                jitted_eval, jitted_eval_ema)
            ema_stats = {"ema_test_acc1": ema_acc1, "ema_test_acc5": ema_acc5}
        else:
            acc1, acc5, test_loss = run_eval()
        max_acc = max(max_acc, acc1)
        # log the lr the optimizer ACTUALLY applied: under grad-accum the inner
        # schedule is stepped by update count (micro-steps // k)
        lr_now = float(sched_opt(
            int(np.asarray(jax.device_get(state.step))) // args.grad_accum))
        # per-epoch keys match the reference's committed logs exactly
        # (logs/normal/recnext_m1_without_distill_300e.txt:1 —
        #  train_lr/train_loss/test_loss/test_acc1/test_acc5)
        stats = {"train_lr": lr_now, "train_loss": train_loss,
                 "test_loss": round(test_loss, 6), "test_acc1": acc1,
                 "test_acc5": acc5, "epoch": epoch, "n_parameters": n_parameters,
                 "epoch_time_s": round(time.time() - t0, 1),
                 "images_per_sec": round(seen / max(time.time() - t0, 1e-9), 1),
                 **ema_stats}
        log(json.dumps(stats))
        if wandb_run is not None:
            wandb_run.log(stats, step=epoch)
        if is_main:
            with open(out_dir / "log.txt", "a") as f:
                f.write(json.dumps(stats) + "\n")
            # summary.csv (timm update_summary counterpart, moganet_train.py:717-720)
            csv_path = out_dir / "summary.csv"
            header = not csv_path.exists()
            with open(csv_path, "a") as f:
                if header:
                    f.write(",".join(stats.keys()) + "\n")
                f.write(",".join(str(v) for v in stats.values()) + "\n")
        mgr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)),
                 metrics={"acc1": acc1})
        mgr.wait_until_finished()
    log(f"max accuracy: {max_acc:.2f}%")
    if args.export_teacher:
        tdir = Path(args.export_teacher).resolve()
        use_ema = not args.no_model_ema
        tvars = jax.device_get(state.variables(ema=use_ema))
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(tdir, tvars)
            ckptr.wait_until_finished()
            log(f"exported {'EMA ' if use_ema else ''}teacher variables to {tdir}")
        except Exception as e:  # orbax/tensorstore can fail on exotic filesystems
            from flax import serialization

            mp = tdir.with_suffix(".msgpack")
            mp.parent.mkdir(parents=True, exist_ok=True)
            mp.write_bytes(serialization.msgpack_serialize(tvars))
            log(f"orbax export failed ({e}); wrote msgpack fallback to {mp}")
    return {"max_acc": max_acc, "state": state}


if __name__ == "__main__":
    main()
