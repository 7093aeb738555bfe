"""On-device Mixup / CutMix with label smoothing (timm Mixup counterpart, batch mode).

Reference config: mixup alpha 0.8, cutmix alpha 1.0, prob 1.0, switch_prob 0.5,
label smoothing 0.1 (/root/reference/main.py:119-131,261-267). Runs inside the jitted
train step on device (SURVEY.md §2.4), pairing each sample with the batch flipped —
exactly timm's batch-mode x.flip(0) mixing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int, smoothing: float = 0.1) -> jnp.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, h: int, w: int, lam: jnp.ndarray):
    """timm rand_bbox: cut ratio sqrt(1-lam), center uniform, clipped to image."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h, cut_w = (h * ratio).astype(jnp.int32), (w * ratio).astype(jnp.int32)
    ry, rx = jax.random.randint(rng, (2,), 0, jnp.array([h, w]))
    y1 = jnp.clip(ry - cut_h // 2, 0, h)
    y2 = jnp.clip(ry + cut_h // 2, 0, h)
    x1 = jnp.clip(rx - cut_w // 2, 0, w)
    x2 = jnp.clip(rx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_cutmix(
    rng: jax.Array,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: NHWC batch; labels: int32. Returns mixed x and soft targets."""
    r_switch, r_mix, r_cut, r_box = jax.random.split(rng, 4)
    use_cutmix = jax.random.bernoulli(r_switch, switch_prob)

    lam_mix = jax.random.beta(r_mix, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(r_cut, cutmix_alpha, cutmix_alpha)

    x_flip = x[::-1]
    h, w = x.shape[1], x.shape[2]

    # cutmix branch: paste flipped box, lam corrected by realized box area
    y1, y2, x1, x2 = _rand_bbox(r_box, h, w, lam_cut)
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    in_box = ((row >= y1) & (row < y2) & (col >= x1) & (col < x2))[None, :, :, None]
    x_cut = jnp.where(in_box, x_flip, x)
    lam_cut_real = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    x_mix = x * lam_mix + x_flip * (1.0 - lam_mix)

    x_out = jnp.where(use_cutmix, x_cut, x_mix)
    lam = jnp.where(use_cutmix, lam_cut_real, lam_mix).astype(jnp.float32)

    t = one_hot_smooth(labels, num_classes, smoothing)
    targets = t * lam + t[::-1] * (1.0 - lam)
    return x_out.astype(x.dtype), targets
