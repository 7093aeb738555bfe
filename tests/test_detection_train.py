"""Detection train step: loss decreases on a fixed synthetic batch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recnext_tpu.models.recnext import RecNextConfig
from recnext_tpu.tasks.detection import RetinaNet, generate_anchors, make_detection_train_step
from recnext_tpu.train.state import TrainState

TINY = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                     depth=(1, 0, 1, 0), mlp_ratio=(2, 2, 2, 2), num_classes=0)


def test_detection_train_step_with_drop_path_backbone():
    """Regression: backbones with drop_path > 0 (m4/m5/s/b) need the droppath rng
    threaded through the detector train step."""
    import dataclasses

    cfg = dataclasses.replace(TINY, drop_path=0.2)
    model = RetinaNet(backbone_cfg=cfg, num_classes=3, fpn_channels=32,
                      frozen_backbone_stats=False)
    img = 64
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))
    feat_shapes = [(img // s, img // s) for s in (4, 8, 16, 32, 64)]
    anchors = jnp.asarray(generate_anchors(feat_shapes, strides=(4, 8, 16, 32, 64)))
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx, ema=False)
    step = jax.jit(make_detection_train_step(model, tx, anchors, num_classes=3))
    batch = {
        "image": jnp.ones((1, img, img, 3)),
        "gt_boxes": jnp.asarray([[[4, 4, 30, 30]]], jnp.float32),
        "gt_labels": jnp.asarray([[1]], jnp.int32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_detection_train_step_runs_and_learns():
    model = RetinaNet(backbone_cfg=TINY, num_classes=4, fpn_channels=32,
                      frozen_backbone_stats=False)
    img = 64
    x0 = jnp.zeros((1, img, img, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    feat_shapes = [(img // s, img // s) for s in (4, 8, 16, 32, 64)]
    anchors = jnp.asarray(generate_anchors(feat_shapes, strides=(4, 8, 16, 32, 64)))

    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx, ema=False)
    step = jax.jit(make_detection_train_step(model, tx, anchors, num_classes=4))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, img, img, 3)).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[4, 4, 28, 28], [30, 30, 60, 58]],
                                 [[10, 8, 40, 44], [-1, -1, -1, -1]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 3], [2, -1]], jnp.int32),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfits the fixed batch
