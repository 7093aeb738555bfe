"""Detection integration — the counterpart of the reference's mmdetection backbone
registration (/root/reference/detection/recnext.py:165-285: multi-scale forward,
classification-checkpoint init, frozen BN, SyncBN) plus a trainable dense head.

The reference plugs RecNext into mmdet's Mask R-CNN as a 4-level feature extractor;
the detector itself (RPN/RoI heads) is mmdet's. Here the stable integration surface is
`DetectionBackbone` (features -> FPN P2..P6, frozen-BN, torch/orbax checkpoint init) —
drop-in for any JAX detection stack — and `RetinaHead`/`RetinaNet` provide a complete
single-stage detector so detection training runs end-to-end inside this framework.
Focal-loss + box-regression training utilities included; COCO-style anchor generation
is standard (scales 8, ratios {0.5,1,2}, strides 8..128).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import Conv2d
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.tasks.fpn import FPN


class DetectionBackbone(nn.Module):
    """RecNext features -> FPN P2..P6 with frozen BN (detection/recnext.py:266-272)."""

    backbone_cfg: RecNextConfig
    fpn_channels: int = 256
    num_outs: int = 5
    frozen_backbone_stats: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = RecNext(cfg=self.backbone_cfg,
                                frozen_stats=self.frozen_backbone_stats,
                                dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=self.fpn_channels, num_outs=self.num_outs,
                        dtype=self.dtype, name="neck")

    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        return self.neck(self.backbone.features(x, training=training))


def init_backbone_from_classification(det_variables, cls_variables):
    """Load classification-checkpoint weights into the detector's `backbone` subtree
    (found at any nesting depth, e.g. extractor/backbone in RetinaNet/MaskRCNN),
    keeping neck/head init — the init_cfg=Pretrained counterpart
    (detection/recnext.py:234-263, non-strict: classifier-head params are dropped)."""

    def replace(tree, new_bb):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "backbone":
                out[k] = new_bb
            else:
                out[k] = replace(v, new_bb)
        return out

    bb = dict(cls_variables["params"])
    bb.pop("head", None)
    out = {"params": replace(dict(det_variables["params"]), bb)}
    if "batch_stats" in det_variables:
        cls_stats = dict(cls_variables.get("batch_stats", {}))
        cls_stats.pop("head", None)
        out["batch_stats"] = replace(dict(det_variables["batch_stats"]), cls_stats)
    return out


class RetinaHead(nn.Module):
    """Shared 4-conv classification and regression towers over every FPN level."""

    num_classes: int = 80
    num_anchors: int = 9
    channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [Conv2d(self.channels, 3, padding=1, dtype=self.dtype,
                            name=f"cls_conv{i}") for i in range(self.stacked_convs)]
        reg_convs = [Conv2d(self.channels, 3, padding=1, dtype=self.dtype,
                            name=f"reg_conv{i}") for i in range(self.stacked_convs)]
        # mmdet RetinaHead init: prediction layers Normal(std=0.01); the cls bias
        # is the focal-loss prior -log((1-pi)/pi), pi=0.01 -> background-heavy
        # initial predictions instead of feature-scale garbage
        init = nn.initializers.normal(0.01)
        cls_out = Conv2d(self.num_anchors * self.num_classes, 3, padding=1,
                         dtype=self.dtype, kernel_init=init,
                         bias_init=nn.initializers.constant(-4.59512),
                         name="cls_out")
        reg_out = Conv2d(self.num_anchors * 4, 3, padding=1, dtype=self.dtype,
                         kernel_init=init, name="reg_out")
        cls_scores, bbox_preds = [], []
        for f in feats:
            c = r = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            b, h, w, _ = f.shape
            cls_scores.append(cls_out(c).reshape(b, h * w * self.num_anchors,
                                                 self.num_classes))
            bbox_preds.append(reg_out(r).reshape(b, h * w * self.num_anchors, 4))
        return jnp.concatenate(cls_scores, axis=1), jnp.concatenate(bbox_preds, axis=1)


class RetinaNet(nn.Module):
    backbone_cfg: RecNextConfig
    num_classes: int = 80
    fpn_channels: int = 256
    frozen_backbone_stats: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.extractor = DetectionBackbone(
            backbone_cfg=self.backbone_cfg, fpn_channels=self.fpn_channels,
            frozen_backbone_stats=self.frozen_backbone_stats, dtype=self.dtype,
            name="extractor")
        self.head = RetinaHead(num_classes=self.num_classes,
                               channels=self.fpn_channels, dtype=self.dtype,
                               name="head")

    def __call__(self, x: jnp.ndarray, training: bool = False):
        return self.head(self.extractor(x, training=training))


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss; targets one-hot (A, C) or zeros for background;
    `valid` masks ignored anchors. Normalized by #positives."""
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    pt = targets * p + (1 - targets) * (1 - p)
    a = targets * alpha + (1 - targets) * (1 - alpha)
    loss = a * (1 - pt) ** gamma * ce
    loss = jnp.where(valid[..., None], loss, 0.0)
    n_pos = jnp.maximum(jnp.sum(targets), 1.0)
    return jnp.sum(loss) / n_pos


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
              beta: float = 1.0 / 9.0) -> jnp.ndarray:
    d = jnp.abs(pred.astype(jnp.float32) - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    loss = jnp.where(mask[..., None], loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def make_detection_train_step(model: RetinaNet, tx, anchors: jnp.ndarray,
                              num_classes: int, seed: int = 0):
    """Jittable RetinaNet train step: per-image MaxIoU anchor assignment, focal loss
    on classes, smooth-L1 on box deltas (the role mmdet's runner+assigner play around
    the reference backbone). batch = {image (B,H,W,3), gt_boxes (B,G,4) padded -1,
    gt_labels (B,G) padded -1}."""
    import optax

    from recnext_tpu.tasks.boxes import assign_anchors, encode_boxes

    def loss_fn(params, batch_stats, batch, rng):
        outputs, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            training=True, mutable=["batch_stats"],
            rngs={"droppath": rng, "dropout": rng})
        cls_scores, bbox_preds = outputs

        def per_image(scores, preds, gtb, gtl):
            idx, labels, pos, valid = assign_anchors(anchors, gtb, gtl)
            targets = jax.nn.one_hot(jnp.where(labels >= 0, labels, 0), num_classes)
            targets = targets * (labels >= 0)[:, None]
            cls = focal_loss(scores, targets, valid)
            deltas = encode_boxes(anchors, gtb[idx])
            deltas = jnp.where(pos[:, None], deltas, 0.0)  # finite grads on masked rows
            box = smooth_l1(preds, deltas, pos)
            return cls + box

        losses = jax.vmap(per_image)(cls_scores, bbox_preds,
                                     batch["gt_boxes"], batch["gt_labels"])
        return jnp.mean(losses), mut["batch_stats"]

    def train_step(state, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
        return state, {"loss": loss}

    return train_step


def retinanet_postprocess(cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray,
                          anchors: jnp.ndarray, *, score_thresh: float = 0.05,
                          iou_thresh: float = 0.5, max_det: int = 100,
                          nms_pre: int = 1000,
                          level_sizes: Optional[Sequence[int]] = None):
    """Single-image inference decode: sigmoid scores -> top-nms_pre prefilter
    (mmdet's nms_pre=1000, configs/_base_/models/retinanet_r50_fpn.py; applied
    PER LEVEL when `level_sizes` gives the anchor count of each pyramid level,
    as mmdet does — a global top-k would let dense coarse-level scores evict
    fine-level small-object candidates) -> per-class NMS (mmdet multiclass_nms
    semantics; fixed-shape, jittable). Without the prefilter the NMS IoU matrix
    over every anchor of a P2-P6 pyramid is quadratic in image area (154 GB at
    img 128, batch 8). Returns (boxes (max_det, 4), scores, labels, valid)."""
    from recnext_tpu.tasks.boxes import decode_boxes, multiclass_nms

    probs = jax.nn.sigmoid(cls_scores.astype(jnp.float32))  # (A, C)
    best_score = jnp.max(probs, axis=-1)
    boxes = decode_boxes(anchors, bbox_preds.astype(jnp.float32))
    if level_sizes is None:
        level_sizes = [best_score.shape[0]]
    assert sum(level_sizes) == best_score.shape[0], \
        f"level_sizes {level_sizes} != {best_score.shape[0]} anchors"
    idx_parts, start = [], 0
    for n in level_sizes:
        k = min(nms_pre, n)
        _, li = jax.lax.top_k(jax.lax.dynamic_slice_in_dim(best_score, start, n), k)
        idx_parts.append(li + start)
        start += n
    top_idx = jnp.concatenate(idx_parts)
    return multiclass_nms(boxes[top_idx], probs[top_idx],
                          score_thresh=score_thresh, iou_thresh=iou_thresh,
                          max_out=max_det)


def generate_anchors(feat_shapes: Sequence[Tuple[int, int]],
                     strides: Sequence[int] = (8, 16, 32, 64, 128),
                     scales=(1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
                     ratios=(0.5, 1.0, 2.0), base_size: int = 4,
                     center_offset: float = 0.5) -> np.ndarray:
    """(sum_l H_l*W_l*A, 4) xyxy anchors, RetinaNet convention (octave base 4x
    stride; ratio = h/w, sizes w = base*scale/sqrt(r), h = base*scale*sqrt(r) as in
    mmdet AnchorGenerator.gen_single_level_base_anchors). center_offset places
    anchor centers at (x + offset) * stride: mmdet uses 0.0 (top-left corner of the
    cell, its backward-compat default), detectron2 and this framework default to
    0.5 (cell centers). Pass 0.0 for exact mmdet grid parity."""
    all_anchors = []
    for (h, w), stride in zip(feat_shapes, strides):
        base = base_size * stride
        ws, hs = [], []
        for r in ratios:
            for s in scales:
                ws.append(base * s * np.sqrt(1.0 / r))
                hs.append(base * s * np.sqrt(r))
        ws, hs = np.asarray(ws), np.asarray(hs)
        cx = (np.arange(w) + center_offset) * stride
        cy = (np.arange(h) + center_offset) * stride
        cy, cx = np.meshgrid(cy, cx, indexing="ij")
        centers = np.stack([cx, cy], axis=-1).reshape(-1, 1, 2)
        sizes = np.stack([ws, hs], axis=-1).reshape(1, -1, 2)
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=-1)
        all_anchors.append(boxes.reshape(-1, 4))
    return np.concatenate(all_anchors).astype(np.float32)
