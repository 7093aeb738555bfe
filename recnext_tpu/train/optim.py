"""Optimizer + LR schedule, matching the reference recipe.

Reference: timm create_optimizer (AdamW, lr 1e-3 x total_batch/512, wd 0.025,
/root/reference/main.py:52-91,318-323) + cosine schedule (5 warmup epochs from
1e-6, cosine over the FULL 300 epochs, min_lr 1e-5 — see cosine_schedule for the
reference's de-facto cooldown/stepping semantics) and AGC gradient clipping
(clip=0.02, /root/reference/main.py:58-61, applied by NativeScaler in engine.py:63-64).

timm's no-weight-decay rule: 1-D params (BN scales/biases, all biases) get wd=0.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def scaled_lr(base_lr: float, global_batch: int) -> float:
    """Linear LR scaling: lr * total_batch / 512 (main.py:318-319)."""
    return base_lr * global_batch / 512.0


def cosine_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int = 300,
    warmup_epochs: int = 5,
    cooldown_epochs: int = 0,
    warmup_lr: float = 1e-6,
    min_lr: float = 1e-5,
):
    """timm CosineLRScheduler exactly as the reference RUNS it (not as its arg
    names suggest): the cosine spans the FULL `epochs` (t_initial = epochs,
    main.py:323), `cooldown_epochs` means EXTRA epochs at min_lr appended AFTER
    the cycle (timm's num_epochs convention — the reference loop main.py:400
    discards that extension, so its de-facto cooldown is 0), and because the
    reference calls lr_scheduler.step(epoch) with the just-FINISHED epoch index
    (main.py:413; timm's train script passes epoch+1), the lr used during epoch
    e is the schedule at t = max(e-1, 0). NOTE: cooldown_epochs does not change
    this function — the t >= epochs clamp already yields min_lr for however
    many extra epochs the CALLER runs (train/main.py extends its loop bound by
    cooldown_epochs); the parameter is accepted only so recipe plumbing can
    pass it through one place.

    Verified value-exact against the committed reference log
    logs/normal/recnext_m1_without_distill_300e.txt (base 2e-3: epoch 4 →
    1.2004e-3 [warmup t=3], epoch 150 → 1.01542e-3 [cosine t=149], epoch 290 →
    1.65941e-5, epoch 299 → 1.02182e-5). Per-step piecewise-constant over
    epochs, like the reference's per-epoch stepping."""

    def sched(step):
        epoch = step // steps_per_epoch
        t = jnp.maximum(epoch - 1, 0)  # the reference's one-epoch step() lag
        warm = warmup_lr + (base_lr - warmup_lr) * (t / max(warmup_epochs, 1))
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t / max(epochs, 1)))
        return jnp.where(t < warmup_epochs, warm,
                         jnp.where(t < epochs, cos, min_lr))

    return sched


def param_labels(params) -> Any:
    """'decay' for >=2-D kernels, 'no_decay' for 1-D (biases, norm scales) — the timm
    no-filter convention used by the reference's create_optimizer."""
    return jax.tree.map(lambda p: "decay" if p.ndim >= 2 else "no_decay", params)


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.025,
    agc_clip: float = 0.02,
    betas=(0.9, 0.999),
    grad_accum: int = 1,
    clip_mode: str = "agc",
) -> optax.GradientTransformation:
    """Gradient clip -> AdamW (wd only on >=2-D params), per the reference recipe.
    clip_mode 'agc' is the RecNeXt recipe (AGC 0.02, main.py:58-61); 'norm' is
    global-norm clipping for the MLLA/Swin-harness recipe (TRAIN.CLIP_GRAD 5.0
    in /root/reference/mlla/logs/*/01_baseline.txt).
    grad_accum > 1 wraps in optax.MultiSteps (the DistOptimizerHook update_interval
    counterpart, /root/reference/detection/mmcv_custom/runner/optimizer.py:1-29)."""

    def adamw(wd):
        return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], weight_decay=wd)

    opt = optax.multi_transform(
        {"decay": adamw(weight_decay), "no_decay": adamw(0.0)},
        param_labels,
    )
    if agc_clip and agc_clip > 0:
        if clip_mode not in ("agc", "norm"):
            raise ValueError(f"unknown clip_mode {clip_mode!r}")
        clip = (optax.adaptive_grad_clip(agc_clip) if clip_mode == "agc"
                else optax.clip_by_global_norm(agc_clip))
        opt = optax.chain(clip, opt)
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt
