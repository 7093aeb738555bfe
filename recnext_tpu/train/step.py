"""The single jitted train/eval step, shardable over a ("data", "fsdp") mesh.

This is the TPU-native replacement for the reference hot loop
(/root/reference/engine.py:21-109): forward in bf16 under jit, distillation loss,
AGC + AdamW update, per-optimizer-update EMA, global-batch BN statistics (SyncBN for free), and
psum'd metrics — all inside ONE compiled program per step. No DDP wrapper, no loss
scaler, no cuda.synchronize.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from recnext_tpu.data.mixup import mixup_cutmix, one_hot_smooth
from recnext_tpu.train import losses as L
from recnext_tpu.train.state import TrainState, ema_update


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    num_classes: int = 1000,
    teacher_apply: Optional[Callable] = None,  # (x) -> teacher logits, no grad
    distillation: str = "none",  # none | hard | soft
    alpha: float = 0.5,
    tau: float = 1.0,
    mixup: bool = True,
    mixup_kwargs: Optional[dict] = None,
    smoothing: float = 0.1,
    ema_decay: float = 0.99996,
    remat: bool = False,
    jsd_splits: int = 0,
    jsd_alpha: float = 12.0,
    grad_accum: int = 1,
    mesa: float = 0.0,
    mesa_start_step: int = 0,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch = {"image": NHWC float, "label": int32}. Jit/shard it with
    recnext_tpu.parallel helpers; all reductions become global under sharding.

    mesa > 0 enables MESA self-distillation — the MLLA recipe's AUG.MESA knob
    (/root/reference/mlla/cfgs/mlla_n.yaml:14; every committed MLLA ablation log
    trains with MESA 1.0): once state.step >= mesa_start_step, add
    mesa * softCE(student, softmax(EMA-model logits)). The EMA teacher forward
    runs INSIDE the same jitted step (no second program, no host sync) and is
    lax-gated by step so one compiled program covers both phases. Requires
    EMA enabled and no dual-head distillation (single logits output).
    """
    mk = dict(num_classes=num_classes, smoothing=smoothing, **(mixup_kwargs or {}))
    if mesa > 0 and (distillation != "none" or jsd_splits > 1):
        raise ValueError("MESA self-distillation requires a single-logits model "
                         "(no dual-head distillation) and is incompatible with JSD")

    def apply_model(params, batch_stats, x, rngs):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            training=True,
            mutable=["batch_stats"],
            rngs=rngs,
        )

    if remat:
        # trade FLOPs for HBM: recompute the forward during backprop, keeping only
        # MXU outputs (jax.checkpoint dots_saveable policy)
        apply_model = jax.checkpoint(
            apply_model, policy=jax.checkpoint_policies.dots_saveable,
            static_argnums=())

    def loss_fn(params, batch_stats, x, targets, teacher_logits, rngs,
                mesa_targets=None, mesa_w=None):
        outputs, mut = apply_model(params, batch_stats, x, rngs)
        if jsd_splits > 1:
            # moganet --jsd-loss path: clean-split CE + JS consistency; excludes
            # mixup/distillation by construction (as in the reference trainer)
            loss = L.jsd_cross_entropy(outputs, targets, num_splits=jsd_splits,
                                       alpha=jsd_alpha, smoothing=smoothing)
            return loss, mut["batch_stats"]
        base = L.soft_target_cross_entropy if targets.ndim == 2 else (
            functools.partial(L.label_smoothing_cross_entropy, smoothing=smoothing)
        )
        loss = L.distillation_loss(
            outputs, targets, teacher_logits,
            base_criterion=base, kind=distillation, alpha=alpha, tau=tau,
        )
        if mesa_targets is not None:
            loss = loss + mesa_w * L.soft_target_cross_entropy(outputs, mesa_targets)
        return loss, mut["batch_stats"]

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_mix, r_drop, r_dropout = jax.random.split(rng, 3)
        x = batch["image"]
        y = batch["label"]
        if mixup:
            x, targets = mixup_cutmix(r_mix, x, y, **mk)
        elif distillation != "none":
            # hard distillation keeps integer labels for the base CE
            targets = y
        else:
            targets = y

        teacher_logits = teacher_apply(x) if teacher_apply is not None else None
        if teacher_logits is not None:
            teacher_logits = jax.lax.stop_gradient(teacher_logits)

        mesa_targets = mesa_w = None
        if mesa > 0:
            # the EMA teacher: inference-mode forward over the EMA weights,
            # inside a lax.cond on step so both training phases share ONE
            # compiled program but the teacher forward EXECUTES only once
            # active (XLA conditionals run the taken branch only; a
            # multiplied-by-zero loss term cannot be dead-coded because the
            # weight is data-dependent — the pre-MESA ~25% of training used to
            # pay the full teacher cost, ADVICE r4). stop_gradient'd like the
            # reference teacher path.
            active = state.step >= mesa_start_step

            def ema_softmax(operand):
                xb, ema_params, ema_stats = operand
                ema_logits = model.apply(
                    {"params": ema_params, "batch_stats": ema_stats},
                    xb, training=False)
                return jax.nn.softmax(ema_logits.astype(jnp.float32), axis=-1)

            mesa_targets = jax.lax.stop_gradient(jax.lax.cond(
                active, ema_softmax,
                lambda operand: jnp.zeros((x.shape[0], num_classes), jnp.float32),
                (x, state.ema_params, state.ema_batch_stats)))
            mesa_w = mesa * active.astype(jnp.float32)

        rngs = {"droppath": r_drop, "dropout": r_dropout}
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, targets, teacher_logits, rngs,
            mesa_targets, mesa_w
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA once per OPTIMIZER update (timm ModelEma, utils.py:155-162): under
        # optax.MultiSteps params only change on the k-th micro-step, and
        # decaying every micro-step would shrink the EMA horizon k-fold
        decay = ema_decay
        if grad_accum > 1:
            applied = (state.step % grad_accum) == (grad_accum - 1)
            decay = jnp.where(applied, ema_decay, 1.0)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=ema_update(state.ema_params, new_params, decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_stats, decay),
        )
        gnorm = optax.global_norm(grads)
        return state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def eval_metrics(logits, labels):
    """Summed correct counts + CE loss so results aggregate exactly across
    shards/batches (engine.py:78-109 counterpart); padded tail rows carry -1."""
    valid = labels >= 0
    top5 = jnp.argsort(logits, axis=-1)[:, -5:]
    acc1 = jnp.sum((top5[:, -1] == labels) & valid)
    acc5 = jnp.sum(jnp.any(top5 == labels[:, None], axis=-1) & valid)
    # summed CE loss over valid rows -> per-epoch test_loss (engine.py:78-109
    # logs criterion(output, target); reference log key `test_loss`)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None], axis=-1)[:, 0]
    loss_sum = jnp.sum(jnp.where(valid, ce, 0.0))
    return {"correct1": acc1, "correct5": acc5, "loss_sum": loss_sum,
            "count": jnp.sum(valid.astype(jnp.int32))}


def make_eval_step(model, *, ema: bool = False):
    """eval_step(state, batch) -> metrics dict (unfused model forward)."""

    def eval_step(state: TrainState, batch):
        variables = state.variables(ema=ema)
        logits = model.apply(variables, batch["image"], training=False)
        return eval_metrics(logits, batch["label"])

    return eval_step


def make_fused_eval_step(cfg, *, ema: bool = False, fused_model=None,
                         packed: bool = True, dtype=jnp.bfloat16):
    """Eval through BN-FUSED weights, lane-packed for the m/a families — the
    in-training counterpart of `validate.py --fused --packed`.

    The reference evaluates the raw (unfused) model every epoch
    (/root/reference/engine.py:78-109); folding BN is a pure parameter
    transform, so each eval epoch can run the deployment graph instead —
    measured ~25% faster per eval forward on v5e (PERF.md round-3 component
    table: 35.1 ms unfused vs ~27 ms fused+packed). `fuse_params(..., xp=jnp)`
    traces INTO this step: no host round-trip, the fold is a few elementwise
    ops per parameter amortized over the batch. Numerics: BN folding is exact
    up to fp32 re-association; the packed executor is bit-exact vs the fused
    model (tests/test_packed_infer.py).

    `cfg` is the RecNextConfig of the TRAINING model (same num_classes /
    overrides). Non-m/a families need `fused_model` = create_model(name,
    fused=True, ...)."""
    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.packed_infer import packed_apply

    use_packed = packed and cfg.family in ("m", "a")
    if not use_packed and fused_model is None:
        raise ValueError("non-packed fused eval needs fused_model")

    def eval_step(state: TrainState, batch):
        fused = fuse_params(state.variables(ema=ema), xp=jnp)
        # the packed executor computes in the INPUT dtype (the loader hands
        # fp32); cast to the training compute dtype so fused eval is the bf16
        # deployment graph, like the fused_model path's internal cast
        x = batch["image"].astype(dtype)
        if use_packed:
            logits = packed_apply(fused, cfg, x)
        else:
            logits = fused_model.apply(fused, x, training=False)
        return eval_metrics(logits, batch["label"])

    return eval_step
