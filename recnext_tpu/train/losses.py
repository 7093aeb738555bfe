"""Losses: soft-target cross-entropy (mixup), label smoothing, DeiT distillation.

Reference: /root/reference/losses.py:8-64 (DistillationLoss, 'hard' = CE vs teacher
argmax on the dist head, 'soft' = tau^2-scaled KL, alpha-blend); base criterion
selection in /root/reference/main.py:354-366 (SoftTargetCrossEntropy under mixup,
LabelSmoothingCrossEntropy(0.1) otherwise).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """targets are probability rows (mixup/cutmix output). Mean over batch."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def label_smoothing_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return label_smoothing_cross_entropy(logits, labels, smoothing=0.0)


def binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                         target_thresh: float = 0.0) -> jnp.ndarray:
    """timm BinaryCrossEntropy counterpart (moganet --bce-loss path,
    /root/reference/moganet_train.py): sigmoid BCE against soft targets, with
    optional target thresholding (--bce-target-thresh)."""
    t = targets.astype(jnp.float32)
    if target_thresh > 0:
        t = (t >= target_thresh).astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(jnp.sum(per, axis=-1) / logits.shape[-1])


def jsd_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, *,
                      num_splits: int = 3, alpha: float = 12.0,
                      smoothing: float = 0.1) -> jnp.ndarray:
    """timm JsdCrossEntropy counterpart (moganet --jsd-loss + --aug-splits path,
    /root/reference/moganet_train.py): the batch holds `num_splits` blocks — block 0
    is the clean view, the rest are augmented views of the SAME samples. Loss =
    smoothed CE on the clean block + alpha * Jensen-Shannon consistency across the
    blocks' softmax distributions (AugMix, Hendrycks et al. 2020)."""
    n = logits.shape[0] // num_splits
    parts = [logits[i * n:(i + 1) * n].astype(jnp.float32)
             for i in range(num_splits)]
    loss = label_smoothing_cross_entropy(parts[0], labels[:n], smoothing=smoothing)
    probs = [jax.nn.softmax(p, axis=-1) for p in parts]
    mean_p = jnp.clip(sum(probs) / num_splits, 1e-7, 1.0)
    logm = jnp.log(mean_p)
    # kl_div(log_mixture, p, 'batchmean') = sum(p * (log p - log m)) / n
    kl = sum(jnp.sum(p * (jnp.log(jnp.clip(p, 1e-7, 1.0)) - logm)) / n
             for p in probs) / num_splits
    return loss + alpha * kl


def distillation_loss(
    outputs,
    targets: jnp.ndarray,
    teacher_logits: Optional[jnp.ndarray] = None,
    *,
    base_criterion: Callable = soft_target_cross_entropy,
    kind: str = "none",
    alpha: float = 0.5,
    tau: float = 1.0,
) -> jnp.ndarray:
    """DeiT distillation blend. `outputs` is the model output: logits, or a
    (logits, logits_dist) tuple when the model runs with distillation=True."""
    outputs_kd = None
    if isinstance(outputs, (tuple, list)):
        outputs, outputs_kd = outputs
    base = base_criterion(outputs, targets)
    if kind == "none":
        return base
    if outputs_kd is None:
        raise ValueError("distillation requires the dual-head (logits, logits_dist) output")
    if teacher_logits is None:
        raise ValueError("distillation requires teacher logits")

    if kind == "soft":
        t = tau
        logp_s = jax.nn.log_softmax(outputs_kd.astype(jnp.float32) / t, axis=-1)
        logp_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
        # KL(log_target) summed, scaled T^2 / numel — exactly torch's reduction='sum'
        # divided by outputs_kd.numel() (losses.py:52-58).
        kl = jnp.sum(jnp.exp(logp_t) * (logp_t - logp_s))
        dist = kl * (t * t) / outputs_kd.size
    elif kind == "hard":
        dist = cross_entropy(outputs_kd, jnp.argmax(teacher_logits, axis=-1))
    else:
        raise ValueError(f"unknown distillation kind {kind!r}")
    return base * (1.0 - alpha) + dist * alpha
