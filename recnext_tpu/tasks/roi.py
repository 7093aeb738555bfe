"""RoIAlign + RPN proposal machinery for two-stage detection — the mmdet pieces the
reference's Mask R-CNN config assumes around its backbone
(/root/reference/detection/configs/_base_/models/mask_rcnn_r50_fpn.py: RPNHead,
SingleRoIExtractor RoIAlign out 7/14, FPN level mapping).

Everything is fixed-shape jnp so it jits on TPU: a constant number of proposals per
image (padded, with validity masks) instead of dynamic box counts.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.tasks.boxes import decode_boxes, nms


def roi_align(
    feat: jnp.ndarray,       # (H, W, C) single level, single image
    boxes: jnp.ndarray,      # (R, 4) xyxy in feature coords
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign (Mask R-CNN, aligned=True convention): for each output cell, average
    sampling_ratio^2 bilinear samples. Returns (R, out_size, out_size, C)."""
    h, w, _ = feat.shape
    r = sampling_ratio

    def one(box):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        # sample grid: out_size*r points per axis, cell-centered
        ys = y1 + (jnp.arange(out_size * r) + 0.5) * bh / (out_size * r)
        xs = x1 + (jnp.arange(out_size * r) + 0.5) * bw / (out_size * r)
        # bilinear gather (aligned=True: -0.5 offset already folded by using
        # continuous coords against pixel centers)
        yy = jnp.clip(ys - 0.5, 0.0, h - 1.0)
        xx = jnp.clip(xs - 0.5, 0.0, w - 1.0)
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (yy - y0)[:, None, None]
        wx = (xx - x0)[None, :, None]
        f00 = feat[y0][:, x0]
        f01 = feat[y0][:, x1i]
        f10 = feat[y1i][:, x0]
        f11 = feat[y1i][:, x1i]
        top = f00 * (1 - wx) + f01 * wx
        bot = f10 * (1 - wx) + f11 * wx
        s = top * (1 - wy) + bot * wy  # (out*r, out*r, C)
        s = s.reshape(out_size, r, out_size, r, -1)
        return jnp.mean(s, axis=(1, 3))

    return jax.vmap(one)(boxes.astype(jnp.float32))


def assign_fpn_level(boxes: jnp.ndarray, num_levels: int = 4,
                     finest_scale: float = 56.0) -> jnp.ndarray:
    """FPN level per RoI, mmdet SingleRoIExtractor rule: level =
    floor(log2(sqrt(area) / finest_scale)), clipped to [0, num_levels) — RoIs with
    side ~56 pool from P2, ~112 from P3, ~224 from P4, >=448 from P5."""
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-8))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],  # per level (H_l, W_l, C), strides given
    boxes: jnp.ndarray,            # (R, 4) xyxy in IMAGE coords
    strides: Sequence[int],
    out_size: int = 7,
) -> jnp.ndarray:
    """Route each RoI to its FPN level and RoIAlign there (fixed shape: computes all
    levels and selects — levels are cheap relative to dynamic gathers on TPU)."""
    lvl = assign_fpn_level(boxes, num_levels=len(feats))
    pooled = []
    for i, (f, s) in enumerate(zip(feats, strides)):
        pooled.append(roi_align(f, boxes / s, out_size))
    stacked = jnp.stack(pooled)  # (L, R, out, out, C)
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0)[0]


def generate_proposals(
    objectness: jnp.ndarray,   # (A,) logits over all anchors
    deltas: jnp.ndarray,       # (A, 4)
    anchors: jnp.ndarray,      # (A, 4)
    *,
    img_hw: Tuple[int, int],
    pre_nms_top_n: int = 1000,
    post_nms_top_n: int = 256,
    nms_thresh: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN proposal generation, fixed shape: top-k by score, decode, clip, NMS.
    Returns (boxes (post_nms_top_n, 4), valid (post_nms_top_n,))."""
    k = min(pre_nms_top_n, objectness.shape[0])
    scores, idx = jax.lax.top_k(objectness, k)
    boxes = decode_boxes(anchors[idx], deltas[idx])
    h, w = img_hw
    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
        jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], axis=-1)
    probs = jax.nn.sigmoid(scores.astype(jnp.float32))
    keep_idx, mask = nms(boxes, probs, iou_thresh=nms_thresh, max_out=post_nms_top_n)
    return boxes[keep_idx], mask
