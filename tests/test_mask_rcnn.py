"""Two-stage detector: RoIAlign correctness, proposal generation, full Mask R-CNN
forward + loss, and a learning check."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recnext_tpu.models.recnext import RecNextConfig
from recnext_tpu.tasks.mask_rcnn import MaskRCNN, mask_rcnn_loss
from recnext_tpu.tasks.roi import assign_fpn_level, generate_proposals, roi_align

TINY = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                     depth=(1, 0, 1, 0), mlp_ratio=(2, 2, 2, 2), num_classes=0)


def test_roi_align_constant_field():
    feat = jnp.full((16, 16, 3), 5.0)
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, boxes, out_size=7)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_field():
    """On a linear ramp f(x,y)=x, samples average to the cell-center x coordinate."""
    xs = jnp.arange(16, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (16, 16, 1))
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(roi_align(feat, boxes, out_size=4))[0, :, :, 0]
    # cell centers along x: 4 + (i+0.5)*2 for i in 0..3 -> 5, 7, 9, 11 (pixel-center
    # convention shifts by 0.5: sample coord - 0.5)
    want = np.asarray([4.5, 6.5, 8.5, 10.5])
    np.testing.assert_allclose(out[0], want, atol=0.3)
    # constant along y
    np.testing.assert_allclose(out[:, 1], out[0, 1] * np.ones(4), atol=1e-4)


def test_assign_fpn_level_mmdet_rule():
    boxes = jnp.asarray([[0, 0, 32, 32], [0, 0, 112, 112], [0, 0, 224, 224],
                         [0, 0, 448, 448]], jnp.float32)
    lv = np.asarray(assign_fpn_level(boxes))
    # finest_scale=56: side 32 -> P2, 112 -> P3, 224 -> P4, 448 -> P5
    np.testing.assert_array_equal(lv, [0, 1, 2, 3])


def test_generate_proposals_shapes():
    a = jnp.asarray(np.random.default_rng(0).uniform(10, 50, (64, 2)))
    anchors = jnp.concatenate([a, a + 12], axis=-1).astype(jnp.float32)
    obj = jnp.asarray(np.random.default_rng(1).normal(size=(64,)).astype(np.float32))
    deltas = jnp.zeros((64, 4), jnp.float32)
    boxes, valid = generate_proposals(obj, deltas, anchors, img_hw=(64, 64),
                                      pre_nms_top_n=32, post_nms_top_n=16)
    assert boxes.shape == (16, 4) and valid.shape == (16,)
    assert bool(valid[0])
    b = np.asarray(boxes)
    assert (b[:, 2] >= b[:, 0]).all() and (b >= 0).all() and (b <= 64).all()


def test_mask_rcnn_forward_and_loss_learns():
    model = MaskRCNN(backbone_cfg=TINY, num_classes=5, fpn_channels=32,
                     num_proposals=32, frozen_backbone_stats=False, with_mask=True)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["proposals"].shape == (1, 32, 4)
    assert out["roi_cls"].shape == (1, 32, 6)
    assert out["mask_logits"].shape == (1, 32, 28, 28, 5)

    gt_masks = np.zeros((1, 2, 64, 64), np.float32)
    gt_masks[0, 0, 8:30, 8:30] = 1.0
    gt_masks[0, 1, 36:56, 36:60] = 1.0
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[8, 8, 30, 30], [36, 36, 60, 56]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 3]], jnp.int32),
        "gt_masks": jnp.asarray(gt_masks),
    }
    tx = optax.adam(1e-3)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def loss_fn(p, b):
            out, mut = model.apply({"params": p, "batch_stats": b}, batch["image"],
                                   training=True, mutable=["batch_stats"])
            return mask_rcnn_loss(out, batch, num_classes=5), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    losses = []
    for _ in range(6):
        params, bs, opt_state, loss = step(params, bs, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
