"""Downstream-task tests: FPN neck, Semantic FPN segmentation, AlignResize."""

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.models.recnext import RecNextConfig
from recnext_tpu.tasks.fpn import FPN
from recnext_tpu.tasks.segmentation import (
    SemanticFPN,
    align_resize,
    miou,
    segmentation_loss,
)

TINY = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                     depth=(1, 1, 1, 1), mlp_ratio=(2, 2, 2, 2), num_classes=0)


def test_fpn_shapes():
    feats = [jnp.ones((2, 16 // s, 16 // s, c))
             for s, c in [(1, 8), (2, 16), (4, 32), (8, 64)]]
    fpn = FPN(out_channels=32, num_outs=5)
    vars_ = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(vars_, feats)
    assert [o.shape for o in outs] == [
        (2, 16, 16, 32), (2, 8, 8, 32), (2, 4, 4, 32), (2, 2, 2, 32), (2, 1, 1, 32)]


def test_semantic_fpn_forward_and_loss():
    model = SemanticFPN(backbone_cfg=TINY, num_classes=19, fpn_channels=32)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, training=False)
    assert logits.shape == (1, 64, 64, 19)

    labels = jnp.zeros((1, 64, 64), jnp.int32).at[0, :8].set(255)
    loss = segmentation_loss(logits, labels)
    assert np.isfinite(float(loss))

    # training mode updates backbone-free BN (head BN) and needs dropout rng
    out, mut = model.apply(variables, x, training=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1),
                                 "droppath": jax.random.PRNGKey(2)})
    assert out.shape == (1, 64, 64, 19)


def test_frozen_backbone_stats_in_segmentation():
    model = SemanticFPN(backbone_cfg=TINY, num_classes=5, fpn_channels=16,
                        frozen_backbone_stats=True)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mut = model.apply(variables, x, training=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1),
                               "droppath": jax.random.PRNGKey(2)})
    before = variables["batch_stats"]["backbone"]
    after = mut["batch_stats"]["backbone"]
    for b, a in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))
    # but the head BN must have moved
    hb = jax.tree_util.tree_leaves(variables["batch_stats"]["decode_head"])
    ha = jax.tree_util.tree_leaves(mut["batch_stats"]["decode_head"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(hb, ha))


def test_miou_accumulators():
    logits = jnp.zeros((1, 4, 4, 3)).at[..., 1].set(10.0)  # predict class 1 everywhere
    labels = jnp.ones((1, 4, 4), jnp.int32)
    inter, union = miou(logits, labels, 3)
    assert int(inter[1]) == 16 and int(union[1]) == 16
    assert float(inter[1]) / float(union[1]) == 1.0


def test_align_resize_divisibility():
    img = np.random.default_rng(0).random((500, 300, 3)).astype(np.float32)
    seg = np.zeros((500, 300), np.int32)
    out_img, out_seg = align_resize(img, seg, scale=(512, 256), size_divisor=32)
    assert out_img.shape[0] % 32 == 0 and out_img.shape[1] % 32 == 0
    assert out_seg.shape == out_img.shape[:2]
