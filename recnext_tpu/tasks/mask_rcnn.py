"""Mask R-CNN-style two-stage detector — the in-framework counterpart of the
reference's COCO integration (/root/reference/detection/configs/
mask_rcnn_recnext_m{3,4,5}_fpn_1x_coco.py on mmdet 2.28.2: RPNHead + shared-2FC
box head + 4-conv mask head over an FPN on the RecNext backbone).

TPU-first: every stage is fixed-shape (constant proposal count with validity masks,
top-k + fixed-size NMS) so the whole model — RPN, RoIAlign, both heads, and all the
losses — compiles into ONE jitted program. No dynamic box counts anywhere.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import Conv2d
from recnext_tpu.models.recnext import RecNextConfig
from recnext_tpu.tasks.boxes import assign_anchors, box_iou, encode_boxes
from recnext_tpu.tasks.detection import DetectionBackbone, generate_anchors, smooth_l1
from recnext_tpu.tasks.roi import generate_proposals, multilevel_roi_align
from recnext_tpu.train.losses import cross_entropy

# mmdet Shared2FCBBoxHead delta coder: target_stds=[0.1, 0.1, 0.2, 0.2]
# (/root/reference/detection/configs/_base_/models/mask_rcnn_r50_fpn.py); the RPN
# coder keeps all-1 stds. Encode and decode must use the same value.
RCNN_DELTA_STDS = (0.1, 0.1, 0.2, 0.2)


class RPNHead(nn.Module):
    """Shared 3x3 conv -> (objectness, box deltas) per level; 3 anchors/location."""

    channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = Conv2d(self.channels, 3, padding=1, dtype=self.dtype, name="conv")
        # mmdet RPNHead: prediction layers Normal(std=0.01) so initial
        # objectness/deltas are ~0 regardless of feature scale
        init = nn.initializers.normal(0.01)
        cls = Conv2d(self.num_anchors, 1, dtype=self.dtype, kernel_init=init,
                     name="cls")
        reg = Conv2d(self.num_anchors * 4, 1, dtype=self.dtype, kernel_init=init,
                     name="reg")
        obj, deltas = [], []
        for f in feats:
            y = nn.relu(conv(f))
            b, h, w, _ = f.shape
            obj.append(cls(y).reshape(b, h * w * self.num_anchors))
            deltas.append(reg(y).reshape(b, h * w * self.num_anchors, 4))
        return jnp.concatenate(obj, axis=1), jnp.concatenate(deltas, axis=1)


class BoxHead(nn.Module):
    """Shared-2FC box head (mmdet Shared2FCBBoxHead): 7x7 RoI -> 1024 -> cls+reg."""

    num_classes: int = 80
    hidden: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray):  # (R, 7, 7, C)
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x))
        # mmdet Shared2FCBBoxHead: fc_cls Normal(0.01), fc_reg Normal(0.001)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01), name="cls")(x)
        reg = nn.Dense(4, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name="reg")(x)  # class-agnostic deltas
        return cls, reg


class MaskHead(nn.Module):
    """4x conv3x3 + x2 upsample + per-class mask logits (mmdet FCNMaskHead)."""

    num_classes: int = 80
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray):  # (R, 14, 14, C)
        x = rois
        for i in range(4):
            x = nn.relu(Conv2d(self.channels, 3, padding=1, dtype=self.dtype,
                               name=f"conv{i}")(x))
        r, h, w, c = x.shape
        x = jax.image.resize(x, (r, h * 2, w * 2, c), method="nearest")
        x = nn.relu(Conv2d(self.channels, 3, padding=1, dtype=self.dtype, name="up")(x))
        # small-init logits: initial mask probs ~0.5 (bce ~0.69) instead of
        # inheriting the feature scale
        return Conv2d(self.num_classes, 1, dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="logits")(x)


class MaskRCNN(nn.Module):
    backbone_cfg: RecNextConfig
    num_classes: int = 80
    fpn_channels: int = 256
    num_proposals: int = 256
    frozen_backbone_stats: bool = True
    with_mask: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.extractor = DetectionBackbone(
            backbone_cfg=self.backbone_cfg, fpn_channels=self.fpn_channels,
            num_outs=5, frozen_backbone_stats=self.frozen_backbone_stats,
            dtype=self.dtype, name="extractor")
        self.rpn = RPNHead(channels=self.fpn_channels, dtype=self.dtype, name="rpn")
        self.box_head = BoxHead(num_classes=self.num_classes, dtype=self.dtype,
                                name="box_head")
        if self.with_mask:
            self.mask_head = MaskHead(num_classes=self.num_classes, dtype=self.dtype,
                                      name="mask_head")

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 gt_boxes: jnp.ndarray = None, gt_labels: jnp.ndarray = None):
        """Returns dict with rpn outputs, proposals (+valid), roi cls/reg (and mask
        logits), for the loss function / postprocessing to consume.

        Pass gt_boxes/gt_labels during training to splice the ground-truth boxes
        into the trailing proposal slots — mmdet's add_gt_as_proposals=True, which
        gives the box/mask heads positive RoIs before the RPN has learned
        anything (without it the heads cold-start on pure background)."""
        img_hw = (x.shape[1], x.shape[2])
        feats = self.extractor(x, training=training)  # P2..P6
        obj, deltas = self.rpn(feats)

        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        # mmdet RPN anchor convention: single scale 8 per level -> sides 32..512 px
        anchors = jnp.asarray(generate_anchors(
            feat_shapes, strides=(4, 8, 16, 32, 64),
            scales=(1.0,), ratios=(0.5, 1.0, 2.0), base_size=8))

        def per_image(o, d):
            return generate_proposals(o, d, anchors, img_hw=img_hw,
                                      post_nms_top_n=self.num_proposals)

        proposals, valid = jax.vmap(per_image)(
            jax.lax.stop_gradient(obj), jax.lax.stop_gradient(deltas))

        if gt_boxes is not None and gt_labels is not None:
            g = gt_boxes.shape[1]

            def splice(props, val, gtb, gv):
                props = props.at[-g:].set(
                    jnp.where(gv[:, None], gtb.astype(props.dtype), props[-g:]))
                val = val.at[-g:].set(gv | val[-g:])
                return props, val

            proposals, valid = jax.vmap(splice)(
                proposals, valid, gt_boxes, gt_labels >= 0)

        rois = jax.vmap(
            lambda f0, f1, f2, f3, b: multilevel_roi_align(
                [f0, f1, f2, f3], b, strides=(4, 8, 16, 32), out_size=7)
        )(feats[0], feats[1], feats[2], feats[3], proposals)

        b, r = rois.shape[0], rois.shape[1]
        cls, reg = self.box_head(rois.reshape(b * r, *rois.shape[2:]))
        out = {
            "anchors": anchors, "rpn_obj": obj, "rpn_deltas": deltas,
            "proposals": proposals, "proposals_valid": valid,
            "roi_cls": cls.reshape(b, r, -1), "roi_reg": reg.reshape(b, r, 4),
        }
        if self.with_mask:
            mrois = jax.vmap(
                lambda f0, f1, f2, f3, bx: multilevel_roi_align(
                    [f0, f1, f2, f3], bx, strides=(4, 8, 16, 32), out_size=14)
            )(feats[0], feats[1], feats[2], feats[3], proposals)
            mlog = self.mask_head(mrois.reshape(b * r, *mrois.shape[2:]))
            out["mask_logits"] = mlog.reshape(b, r, *mlog.shape[1:])
        return out


    def predict(self, x: jnp.ndarray, *, score_thresh: float = 0.05,
                iou_thresh: float = 0.5, max_det: int = 100):
        """Fixed-shape inference (mmdet test-time path): RPN proposals -> box head
        refine + class scores -> NMS -> mask head on the REFINED boxes. Returns
        (boxes (B,D,4) canvas coords, scores (B,D), labels (B,D), mask_probs
        (B,D,m,m) or None, valid (B,D))."""
        from recnext_tpu.tasks.boxes import decode_boxes, multiclass_nms

        img_hw = (x.shape[1], x.shape[2])
        feats = self.extractor(x, training=False)
        obj, deltas = self.rpn(feats)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(generate_anchors(
            feat_shapes, strides=(4, 8, 16, 32, 64),
            scales=(1.0,), ratios=(0.5, 1.0, 2.0), base_size=8))

        proposals, pvalid = jax.vmap(
            lambda o, d: generate_proposals(o, d, anchors, img_hw=img_hw,
                                            post_nms_top_n=self.num_proposals)
        )(obj, deltas)

        rois = jax.vmap(
            lambda f0, f1, f2, f3, b: multilevel_roi_align(
                [f0, f1, f2, f3], b, strides=(4, 8, 16, 32), out_size=7)
        )(feats[0], feats[1], feats[2], feats[3], proposals)
        b, r = rois.shape[0], rois.shape[1]
        cls, reg = self.box_head(rois.reshape(b * r, *rois.shape[2:]))
        cls = cls.reshape(b, r, -1)
        reg = reg.reshape(b, r, 4)

        def per_image(props, pv, c, rg):
            # per-class NMS over the refined boxes (mmdet multiclass_nms)
            probs = jax.nn.softmax(c.astype(jnp.float32), axis=-1)[:, :-1]
            probs = probs * pv[:, None]
            boxes = decode_boxes(props, rg.astype(jnp.float32),
                                 stds=RCNN_DELTA_STDS, max_shape=img_hw)
            return multiclass_nms(boxes, probs, score_thresh=score_thresh,
                                  iou_thresh=iou_thresh, max_out=max_det)

        det_boxes, det_scores, det_labels, det_valid = jax.vmap(per_image)(
            proposals, pvalid.astype(jnp.float32), cls, reg)

        mask_probs = None
        if self.with_mask:
            mrois = jax.vmap(
                lambda f0, f1, f2, f3, bx: multilevel_roi_align(
                    [f0, f1, f2, f3], bx, strides=(4, 8, 16, 32), out_size=14)
            )(feats[0], feats[1], feats[2], feats[3], det_boxes)
            d = det_boxes.shape[1]
            mlog = self.mask_head(mrois.reshape(b * d, *mrois.shape[2:]))
            mlog = mlog.reshape(b, d, *mlog.shape[1:])  # (B, D, m, m, C)
            sel = jnp.clip(det_labels, 0, mlog.shape[-1] - 1)
            mlog = jnp.take_along_axis(
                mlog, sel[:, :, None, None, None], axis=-1)[..., 0]
            mask_probs = jax.nn.sigmoid(mlog.astype(jnp.float32))
        return det_boxes, det_scores, det_labels, mask_probs, det_valid


def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray, orig_hw, scale: float,
                thresh: float = 0.5) -> np.ndarray:
    """Host-side mask pasting: (D, m, m) probabilities + canvas-coord boxes ->
    (D, H, W) binary masks in ORIGINAL image coordinates (boxes divided by the
    letterbox scale). The mmdet _do_paste_mask counterpart, numpy/PIL."""
    from PIL import Image

    H, W = int(orig_hw[0]), int(orig_hw[1])
    out = np.zeros((len(boxes), H, W), np.uint8)
    for i, (box, mp) in enumerate(zip(np.asarray(boxes) / scale,
                                      np.asarray(mask_probs))):
        x1, y1, x2, y2 = box
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        w, h = max(x2i - x1i, 1), max(y2i - y1i, 1)
        m = Image.fromarray((mp * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR)
        m = np.asarray(m, np.float32) / 255.0 >= thresh
        sx1, sy1 = max(0, -x1i), max(0, -y1i)
        dx1, dy1 = max(0, x1i), max(0, y1i)
        dx2, dy2 = min(W, x1i + w), min(H, y1i + h)
        if dx2 > dx1 and dy2 > dy1:
            out[i, dy1:dy2, dx1:dx2] = m[sy1:sy1 + dy2 - dy1,
                                         sx1:sx1 + dx2 - dx1]
    return out


def mask_rcnn_loss(outputs, batch, *, num_classes: int,
                   return_components: bool = False):
    """RPN (BCE + smooth-L1, pos 0.7 / neg 0.3) + RoI head (CE over C+1 with
    background, smooth-L1 on positives) + mask BCE (matched-class channel vs the gt
    mask cropped to each positive proposal). batch: gt_boxes (B,G,4) pad -1,
    gt_labels (B,G) pad -1, optional gt_masks (B,G,H,W) binary at image resolution
    (mask term skipped when absent)."""
    anchors = outputs["anchors"]

    def rpn_per_image(obj, deltas, gtb, gtl):
        idx, _, pos, valid_m = assign_anchors(anchors, gtb, gtl,
                                              pos_iou=0.7, neg_iou=0.3)
        t = pos.astype(jnp.float32)
        o = obj.astype(jnp.float32)
        bce = jnp.maximum(o, 0) - o * t + jnp.log1p(jnp.exp(-jnp.abs(o)))
        # mmdet samples 256 anchors at pos_fraction=0.5 (RandomSampler); the
        # fixed-shape equivalent is the EXPECTATION of that sampled loss:
        # equal pos/neg class weight. A plain mean gives positives ~0.2% of the
        # gradient and the RPN never learns objectness.
        neg = valid_m & ~pos
        bce_pos = jnp.sum(jnp.where(pos, bce, 0.0)) / jnp.maximum(jnp.sum(pos), 1)
        bce_neg = jnp.sum(jnp.where(neg, bce, 0.0)) / jnp.maximum(jnp.sum(neg), 1)
        bce = 0.5 * (bce_pos + bce_neg)
        tgt = encode_boxes(anchors, gtb[idx])
        tgt = jnp.where(pos[:, None], tgt, 0.0)  # keep masked rows finite for grads
        reg = smooth_l1(deltas, tgt, pos)
        return bce + reg

    rpn_loss = jnp.mean(jax.vmap(rpn_per_image)(
        outputs["rpn_obj"], outputs["rpn_deltas"], batch["gt_boxes"],
        batch["gt_labels"]))

    def roi_per_image(props, valid_m, cls, reg, gtb, gtl):
        gt_valid = gtl >= 0
        iou = box_iou(props, gtb) * gt_valid[None, :]
        best = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        pos = (best_iou >= 0.5) & valid_m
        # labels: classes 0..C-1 for positives; background = C
        labels = jnp.where(pos, gtl[best], num_classes)
        logp = jax.nn.log_softmax(cls.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        # mmdet samples 512 RoIs at pos_fraction=0.25; expectation-equivalent
        # reweighting (plain mean drowns the rare positives in background CE)
        neg = valid_m & ~pos
        ce_pos = jnp.sum(jnp.where(pos, ce, 0.0)) / jnp.maximum(jnp.sum(pos), 1)
        ce_neg = jnp.sum(jnp.where(neg, ce, 0.0)) / jnp.maximum(jnp.sum(neg), 1)
        ce = 0.25 * ce_pos + 0.75 * ce_neg
        tgt = encode_boxes(props, gtb[best], stds=RCNN_DELTA_STDS)
        tgt = jnp.where(pos[:, None], tgt, 0.0)
        reg_l = smooth_l1(reg, tgt, pos)
        return ce + reg_l

    roi_loss = jnp.mean(jax.vmap(roi_per_image)(
        outputs["proposals"], outputs["proposals_valid"], outputs["roi_cls"],
        outputs["roi_reg"], batch["gt_boxes"], batch["gt_labels"]))

    mask_loss = 0.0
    if "mask_logits" in outputs and "gt_masks" in batch:
        from recnext_tpu.tasks.roi import roi_align

        msize = outputs["mask_logits"].shape[2]

        def mask_per_image(props, valid_m, mlog, gtb, gtl, gtm):
            gt_valid = gtl >= 0
            iou = box_iou(props, gtb) * gt_valid[None, :]
            best = jnp.argmax(iou, axis=1)
            pos = (jnp.max(iou, axis=1) >= 0.5) & valid_m
            # crop each matched gt mask (image-res binary, (G, H, W)) to the proposal
            tgt = roi_align(gtm.astype(jnp.float32).transpose(1, 2, 0),
                            props, out_size=msize)  # (R, m, m, G)
            tgt = jnp.take_along_axis(
                tgt, best[:, None, None, None], axis=-1)[..., 0]
            tgt = (tgt > 0.5).astype(jnp.float32)
            # per-class logits: select the matched gt class channel
            logit = jnp.take_along_axis(
                mlog, jnp.clip(gtl[best], 0, mlog.shape[-1] - 1)[
                    :, None, None, None], axis=-1)[..., 0].astype(jnp.float32)
            bce = (jnp.maximum(logit, 0) - logit * tgt
                   + jnp.log1p(jnp.exp(-jnp.abs(logit))))
            bce = jnp.where(pos[:, None, None], bce, 0.0)
            return jnp.sum(bce) / jnp.maximum(jnp.sum(pos) * msize * msize, 1)

        mask_loss = jnp.mean(jax.vmap(mask_per_image)(
            outputs["proposals"], outputs["proposals_valid"],
            outputs["mask_logits"], batch["gt_boxes"], batch["gt_labels"],
            batch["gt_masks"]))

    total = rpn_loss + roi_loss + mask_loss
    if return_components:
        return total, {"loss_rpn": rpn_loss, "loss_roi": roi_loss,
                       "loss_mask": mask_loss}
    return total
