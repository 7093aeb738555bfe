"""Semantic FPN segmentation — the reference's ADE20K integration
(/root/reference/segmentation/: mmseg EncoderDecoder with FPN neck + FPNHead decode
head, configs/sem_fpn/fpn_recnext_m*_ade20k_40k.py) as a single Flax model.

* backbone: any registry RecNext, frozen-BN mode (detection/recnext.py:266-272
  counterpart) selectable.
* neck: FPN(out=256, 4 levels).
* head: FPNHead — per-level scale head (3x3 conv + BN + ReLU, bilinear x2 per octave
  above stride 4), summed, dropout, 1x1 classifier, upsampled to input resolution.
* loss: per-pixel CE with ignore_index=255.
* AlignResize: eval-time resize with /32 alignment of both image and seg map —
  required because RecConv's pyramid needs size-divisible inputs
  (/root/reference/segmentation/align_resize.py:9-230).

Training schedule parity targets: AdamW lr 1e-4, wd 0.05, poly power 0.9, 40k iters.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import BatchNorm, Conv2d
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.ops.resize import resize
from recnext_tpu.tasks.fpn import FPN


class FPNHead(nn.Module):
    """mmseg FPNHead: scale heads collapse each level to stride 4, sum, classify."""

    num_classes: int
    channels: int = 128
    feature_strides: Tuple[int, ...] = (4, 8, 16, 32)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, training: bool = False) -> jnp.ndarray:
        outs = []
        target_hw = feats[0].shape[1:3]
        for i, (f, stride) in enumerate(zip(feats, self.feature_strides)):
            reps = max(1, int(np.log2(stride) - np.log2(self.feature_strides[0])))
            x = f
            for r in range(reps):
                x = Conv2d(self.channels, 3, padding=1, use_bias=False,
                           dtype=self.dtype, name=f"scale{i}_conv{r}")(x)
                x = BatchNorm(name=f"scale{i}_bn{r}")(x, training=training)
                x = nn.relu(x)
                if stride != self.feature_strides[0]:
                    x = resize(x, (x.shape[1] * 2, x.shape[2] * 2), mode="bilinear")
            outs.append(resize(x, target_hw, mode="bilinear"))
        x = sum(outs)
        if self.dropout > 0 and training:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
            x = jnp.where(mask, x / keep, 0.0)
        return Conv2d(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                      name="conv_seg")(x)


class SemanticFPN(nn.Module):
    """backbone features -> FPN -> FPNHead -> logits at input resolution."""

    backbone_cfg: RecNextConfig
    num_classes: int = 150
    fpn_channels: int = 256
    frozen_backbone_stats: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.backbone_cfg
        self.backbone = RecNext(
            cfg=cfg, frozen_stats=self.frozen_backbone_stats, dtype=self.dtype,
            name="backbone",
        )
        self.neck = FPN(out_channels=self.fpn_channels, num_outs=4, dtype=self.dtype,
                        name="neck")
        self.decode_head = FPNHead(num_classes=self.num_classes, dtype=self.dtype,
                                   name="decode_head")

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        feats = self.backbone.features(x, training=training)
        feats = self.neck(feats)
        logits = self.decode_head(feats, training=training)
        return resize(logits, x.shape[1:3], mode="bilinear")


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = 255) -> jnp.ndarray:
    """Per-pixel CE with ignore label (mmseg CrossEntropyLoss counterpart)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def miou(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
         ignore_index: int = 255):
    """Per-batch (intersection, union) accumulators for mIoU."""
    pred = jnp.argmax(logits, axis=-1)
    valid = labels != ignore_index
    inter = jnp.zeros((num_classes,), jnp.int32)
    union = jnp.zeros((num_classes,), jnp.int32)
    p1h = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32) * valid[..., None]
    l1h = jax.nn.one_hot(jnp.where(valid, labels, 0), num_classes, dtype=jnp.int32) * valid[..., None]
    inter = jnp.sum(p1h * l1h, axis=tuple(range(pred.ndim)))
    union = jnp.sum(p1h, axis=tuple(range(pred.ndim))) + jnp.sum(
        l1h, axis=tuple(range(pred.ndim))) - inter
    return inter, union


def seg_train_sample(rng: np.random.Generator, img, seg: np.ndarray, crop: int,
                     scale_range=(0.5, 2.0), ignore_index: int = 255):
    """mmseg-style train sample: random scale, random crop (pad with ignore), hflip,
    normalize. img: PIL; seg: (H, W) int labels. Returns (crop,crop,3) f32 and
    (crop,crop) i32."""
    from PIL import Image

    from recnext_tpu.data.transforms import normalize

    w, h = img.size
    f = rng.uniform(*scale_range)
    nw, nh = max(1, int(w * f)), max(1, int(h * f))
    img = img.resize((nw, nh), Image.BILINEAR)
    seg_img = Image.fromarray(seg.astype(np.int32), mode="I").resize((nw, nh),
                                                                     Image.NEAREST)
    seg = np.asarray(seg_img, dtype=np.int32)
    arr = normalize(img).astype(np.float32)

    # pad to at least crop with ignore/zeros
    ph, pw = max(crop - nh, 0), max(crop - nw, 0)
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)))
        seg = np.pad(seg, ((0, ph), (0, pw)), constant_values=ignore_index)
    y = int(rng.integers(0, arr.shape[0] - crop + 1))
    x = int(rng.integers(0, arr.shape[1] - crop + 1))
    arr = arr[y:y + crop, x:x + crop]
    seg = seg[y:y + crop, x:x + crop]
    if rng.random() < 0.5:
        arr = arr[:, ::-1].copy()
        seg = seg[:, ::-1].copy()
    return arr, seg


def seg_eval_sample(img, seg: np.ndarray, crop: int, ignore_index: int = 255):
    """Deterministic eval sample at a fixed (crop, crop) shape: scale the SHORT
    side to `crop` (aspect kept), center crop, pad-with-ignore — the fixed-shape
    stand-in for mmseg's whole-image eval so the jitted eval step compiles once.
    img: PIL; seg: (H, W) int labels. Returns ((crop,crop,3) f32, (crop,crop) i32)."""
    from PIL import Image

    from recnext_tpu.data.transforms import normalize

    w, h = img.size
    f = crop / min(w, h)
    nw, nh = max(1, int(round(w * f))), max(1, int(round(h * f)))
    img = img.resize((nw, nh), Image.BILINEAR)
    seg_img = Image.fromarray(seg.astype(np.int32), mode="I").resize((nw, nh),
                                                                     Image.NEAREST)
    seg = np.asarray(seg_img, dtype=np.int32)
    arr = normalize(img).astype(np.float32)
    ph, pw = max(crop - nh, 0), max(crop - nw, 0)
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)))
        seg = np.pad(seg, ((0, ph), (0, pw)), constant_values=ignore_index)
    y = (arr.shape[0] - crop) // 2
    x = (arr.shape[1] - crop) // 2
    return arr[y:y + crop, x:x + crop], seg[y:y + crop, x:x + crop]


def align_resize(img: np.ndarray, seg: Optional[np.ndarray] = None,
                 scale: Tuple[int, int] = (2048, 512), size_divisor: int = 32):
    """Eval-time AlignResize: keep-ratio resize to `scale`, then round BOTH dims up to
    /size_divisor with edge-resize (not padding), applied to image (bilinear) and seg
    map (nearest) — segmentation/align_resize.py:9-230 semantics."""
    from recnext_tpu.ops.resize import resize as jresize

    h, w = img.shape[:2]
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    nh, nw = int(h * f + 0.5), int(w * f + 0.5)
    ah = int(np.ceil(nh / size_divisor)) * size_divisor
    aw = int(np.ceil(nw / size_divisor)) * size_divisor
    img_j = jresize(jnp.asarray(img, jnp.float32)[None], (ah, aw), mode="bilinear")[0]
    out_img = np.asarray(img_j)
    out_seg = None
    if seg is not None:
        seg_j = jresize(jnp.asarray(seg)[None, :, :, None], (ah, aw), mode="nearest")
        out_seg = np.asarray(seg_j[0, :, :, 0])
    return out_img, out_seg
