"""Detection integration tests: backbone+FPN extractor, classification-checkpoint
init, RetinaNet forward + losses, anchor generation."""

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.tasks.detection import (
    DetectionBackbone,
    RetinaNet,
    focal_loss,
    generate_anchors,
    init_backbone_from_classification,
    smooth_l1,
)

TINY = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                     depth=(1, 1, 1, 1), mlp_ratio=(2, 2, 2, 2), num_classes=10)


def test_detection_backbone_pyramid():
    m = DetectionBackbone(backbone_cfg=TINY, fpn_channels=32, num_outs=5)
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32), (1, 1, 1, 32)]


def test_detection_backbone_pyramid_a_family():
    """The A family (RecAttn mixers) feeds the same FPN extractor — the role of
    the reference's separate detection/recattn.py backbone copy."""
    cfg = RecNextConfig(name="tiny_a", family="a", embed_dim=(8, 16, 32, 64),
                        depth=(1, 1, 1, 1), mlp_ratio=(2, 2, 2, 2),
                        num_classes=10)
    m = DetectionBackbone(backbone_cfg=cfg, fpn_channels=32, num_outs=5)
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32), (1, 1, 1, 32)]


def test_init_from_classification_checkpoint():
    cls = RecNext(cfg=TINY)
    x = jnp.ones((1, 64, 64, 3))
    cls_vars = cls.init(jax.random.PRNGKey(7), x)

    det = DetectionBackbone(backbone_cfg=TINY, fpn_channels=32)
    det_vars = det.init(jax.random.PRNGKey(0), x)
    loaded = init_backbone_from_classification(det_vars, cls_vars)

    # backbone stem weights must equal the classification checkpoint's
    a = loaded["params"]["backbone"]["stem"]["conv1"]["conv"]["kernel"]
    b = cls_vars["params"]["stem"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "head" not in loaded["params"]["backbone"]
    # and it still runs
    outs = det.apply(loaded, x)
    assert len(outs) == 5


def test_retinanet_forward_and_losses():
    m = RetinaNet(backbone_cfg=TINY, num_classes=4, fpn_channels=32)
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    cls_scores, bbox_preds = m.apply(variables, x)
    n_anchors = sum((64 // s) ** 2 * 9 for s in (4, 8, 16, 32, 64))
    assert cls_scores.shape == (1, n_anchors, 4)
    assert bbox_preds.shape == (1, n_anchors, 4)

    targets = jnp.zeros_like(cls_scores).at[0, 0, 1].set(1.0)
    valid = jnp.ones(cls_scores.shape[:2], bool)
    fl = focal_loss(cls_scores, targets, valid)
    pos = jnp.zeros(cls_scores.shape[:2], bool).at[0, 0].set(True)
    sl = smooth_l1(bbox_preds, jnp.ones_like(bbox_preds), pos)
    assert np.isfinite(float(fl)) and np.isfinite(float(sl))


def test_init_from_classification_nested():
    """Checkpoint init also reaches the backbone nested inside RetinaNet/MaskRCNN."""
    cls = RecNext(cfg=TINY)
    x = jnp.ones((1, 64, 64, 3))
    cls_vars = cls.init(jax.random.PRNGKey(7), x)
    det = RetinaNet(backbone_cfg=TINY, num_classes=4, fpn_channels=32)
    det_vars = det.init(jax.random.PRNGKey(0), x)
    loaded = init_backbone_from_classification(det_vars, cls_vars)
    a = loaded["params"]["extractor"]["backbone"]["stem"]["conv1"]["conv"]["kernel"]
    b = cls_vars["params"]["stem"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = det.apply(loaded, x)
    assert out[0].shape[0] == 1


def test_retinanet_postprocess():
    from recnext_tpu.tasks.detection import retinanet_postprocess

    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30], [1, 1, 11, 11]],
                          jnp.float32)
    cls = jnp.full((3, 4), -10.0).at[0, 2].set(5.0).at[1, 1].set(4.0).at[2, 2].set(4.5)
    deltas = jnp.zeros((3, 4), jnp.float32)
    boxes, scores, labels, mask = retinanet_postprocess(cls, deltas, anchors,
                                                        max_det=5)
    kept = np.asarray(mask)
    assert kept.sum() == 2  # anchor 2 suppressed by overlapping anchor 0
    assert int(labels[0]) == 2 and int(labels[1]) == 1
    np.testing.assert_allclose(np.asarray(boxes[0]), [0, 0, 10, 10], atol=1e-4)


def test_anchor_generation():
    anchors = generate_anchors([(8, 8), (4, 4)], strides=(8, 16))
    assert anchors.shape == (8 * 8 * 9 + 4 * 4 * 9, 4)
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    assert (w > 0).all() and (h > 0).all()
    # ratio-1 scale-1 anchor at stride 8 has side base_size*stride = 32
    np.testing.assert_allclose(w[3], 32.0, rtol=1e-5)


def test_retinanet_postprocess_nms_pre_prefilter():
    """Top-k prefilter (mmdet nms_pre) must not change results when it keeps all
    survivors, and must bound the NMS problem size for big anchor sets."""
    import numpy as np

    from recnext_tpu.tasks.detection import retinanet_postprocess

    rng = np.random.default_rng(0)
    A, C = 500, 4
    cls = jnp.asarray(rng.normal(size=(A, C)).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.normal(size=(A, 4)).astype(np.float32))
    xy = rng.uniform(0, 100, (A, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + 10], axis=-1))
    full = retinanet_postprocess(cls, deltas, anchors, nms_pre=A, max_det=20)
    pre = retinanet_postprocess(cls, deltas, anchors, nms_pre=100, max_det=20)
    # the top-20 detections live well inside the top-100 scores, so both agree
    for a, b in zip(full, pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
