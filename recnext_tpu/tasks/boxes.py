"""Box utilities for detection training/inference: IoU, anchor-target assignment,
delta box coding, decoding, and NMS — the pieces mmdet supplies around the reference's
backbone (/root/reference/detection/configs/_base_/models/mask_rcnn_r50_fpn.py:
MaxIoUAssigner pos_iou_thr 0.5 / neg_iou_thr 0.4, DeltaXYWHBBoxCoder, nms 0.5).

All functions are jnp and fixed-shape so they run inside jit on TPU; padding with
invalid boxes (all -1) is used instead of dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (N,4) and (M,4) xyxy boxes."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray,
                 means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
                 stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
                 ) -> jnp.ndarray:
    """DeltaXYWH encoding (mmdet bbox2delta semantics,
    mmdet/core/bbox/coder/delta_xywh_bbox_coder.py): (dx, dy, dw, dh) of gt
    relative to anchors, normalized by target means/stds. The reference's Mask
    R-CNN config uses stds (0.1, 0.1, 0.2, 0.2) for the RCNN head and all-1 for
    the RPN (/root/reference/detection/configs/_base_/models/mask_rcnn_r50_fpn.py).
    Degenerate anchors (zero extent, e.g. fully-clipped proposals) are clamped so
    the encoding stays finite — callers mask such rows out of the loss, but an inf
    here would still poison gradients through jnp.where."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-3)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-3)
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-6)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-6)
    gx = gt[:, 0] + gw / 2
    gy = gt[:, 1] + gh / 2
    deltas = jnp.stack([(gx - ax) / aw, (gy - ay) / ah,
                        jnp.log(gw / aw), jnp.log(gh / ah)], axis=-1)
    return (deltas - jnp.asarray(means)) / jnp.asarray(stds)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
                 stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
                 wh_ratio_clip: float = 16 / 1000,
                 max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """mmdet delta2bbox semantics: denormalize by means/stds, clamp dw/dh to
    +-|log(wh_ratio_clip)| (default 16/1000 -> +-4.135), exponentiate onto the
    anchor size, and optionally clamp the result to [0, W] x [0, H] when
    max_shape=(H, W) is given."""
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    cx = d[:, 0] * aw + ax
    cy = d[:, 1] * ah + ay
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    w = jnp.exp(jnp.clip(d[:, 2], -max_ratio, max_ratio)) * aw
    h = jnp.exp(jnp.clip(d[:, 3], -max_ratio, max_ratio)) * ah
    out = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    if max_shape is not None:
        hh, ww = max_shape
        out = jnp.stack([jnp.clip(out[:, 0], 0, ww), jnp.clip(out[:, 1], 0, hh),
                         jnp.clip(out[:, 2], 0, ww), jnp.clip(out[:, 3], 0, hh)],
                        axis=-1)
    return out


def assign_anchors(
    anchors: jnp.ndarray,      # (A, 4)
    gt_boxes: jnp.ndarray,     # (G, 4), padded rows = all -1
    gt_labels: jnp.ndarray,    # (G,), padded = -1
    *,
    pos_iou: float = 0.5,
    neg_iou: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MaxIoU assignment. Returns (matched_gt_idx, labels, pos_mask, valid_mask):
    labels = class id for positives, -1 otherwise; valid excludes the ignore band
    between neg_iou and pos_iou; each valid gt's best anchor is forced positive."""
    gt_valid = gt_labels >= 0
    iou = box_iou(anchors, gt_boxes) * gt_valid[None, :]
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= pos_iou
    neg = best_iou < neg_iou
    valid = pos | neg

    # force-match: the argmax anchor of each VALID gt becomes positive for that
    # gt. Invalid (padded) gts all argmax to anchor 0 on their zeroed iou
    # column, so scatter them to the out-of-range index A instead — otherwise a
    # padded gt could overwrite a real gt's force-match at anchor 0 (force
    # False / forced_gt = padded index -> a positive anchor with label -1).
    best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    target = jnp.where(gt_valid, best_anchor, anchors.shape[0])
    force = jnp.zeros(anchors.shape[0], bool)
    force = force.at[target].set(True, mode="drop")
    forced_gt = jnp.zeros(anchors.shape[0], jnp.int32)
    forced_gt = forced_gt.at[target].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop")
    best_gt = jnp.where(force, forced_gt, best_gt)
    pos = pos | force
    valid = valid | force

    labels = jnp.where(pos, gt_labels[best_gt], -1)
    return best_gt, labels, pos, valid


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, *, iou_thresh: float = 0.5,
        max_out: int = 100, iou: jnp.ndarray | None = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape greedy NMS under jit: returns (indices, keep_mask) of max_out
    selections in descending-score order; unused slots have keep_mask False.
    Scores <= 0 are never kept (callers zero sub-threshold scores).

    TPU-shaped formulation: a lax.scan of max_out argmax picks over the raw
    (unsorted) boxes — each pick suppresses its IoU>thresh neighbours by
    masking them to -inf, so only KEPT boxes ever suppress (exact greedy-NMS
    semantics, same first-index tie-break as sort-based NMS). This needs no
    per-call argsort/box-gather and runs O(max_out·N) instead of the O(N²)
    suppression sweep, and the IoU matrix can be passed in precomputed —
    `multiclass_nms` shares ONE (N,N) matrix across all classes, where the
    per-class-sorted formulation materialized (C,N,N) (171 GB for RetinaNet
    @512², the round-4 OOM this rewrite fixed)."""
    if iou is None:
        iou = box_iou(boxes, boxes)
    neg = jnp.float32(-jnp.inf)

    def pick_one(s, _):
        i = jnp.argmax(s)
        v = s[i]
        # the pick's own row has IoU(i,i)=1 > thresh for any real box; the
        # explicit .at[i] also covers degenerate zero-area boxes (self-IoU 0)
        s = jnp.where(iou[i] > iou_thresh, neg, s).at[i].set(neg)
        return s, (i.astype(jnp.int32), v)

    _, (idx, vals) = jax.lax.scan(pick_one, scores.astype(jnp.float32), None,
                                  length=max_out)
    mask = vals > 0
    return jnp.where(mask, idx, 0), mask


def multiclass_nms(
    boxes: jnp.ndarray,   # (N, 4) shared across classes
    probs: jnp.ndarray,   # (N, C) per-class scores
    *,
    score_thresh: float = 0.05,
    iou_thresh: float = 0.5,
    max_out: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mmdet multiclass_nms counterpart (mmdet/core/post_processing/bbox_nms.py
    semantics): independent NMS per class over the shared box set, then a global
    top-max_out across classes. Fixed-shape and jittable.

    Returns (boxes (max_out, 4), scores, labels, valid_mask)."""
    num_classes = probs.shape[-1]
    # the box set is shared across classes (class-agnostic regression), so the
    # (N,N) IoU matrix is computed ONCE and closed over by the per-class NMS
    shared_iou = box_iou(boxes, boxes)

    def one_class(scores_c):
        s = jnp.where(scores_c >= score_thresh, scores_c.astype(jnp.float32), 0.0)
        idx, m = nms(boxes, s, iou_thresh=iou_thresh, max_out=max_out,
                     iou=shared_iou)
        return boxes[idx], s[idx] * m, m

    bx, sc, mk = jax.vmap(one_class, in_axes=1)(probs)  # (C, max_out, ...)
    del mk  # sc is already zeroed on dropped slots (s[idx] * m in one_class)
    labels = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[:, None], (num_classes, max_out))
    bx = bx.reshape(num_classes * max_out, 4)
    sc = sc.reshape(num_classes * max_out)
    labels = labels.reshape(num_classes * max_out)
    top_s, top_i = jax.lax.top_k(sc, max_out)
    valid = top_s > 0.0
    return bx[top_i], top_s, jnp.where(valid, labels[top_i], 0), valid
