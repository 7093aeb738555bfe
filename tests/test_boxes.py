"""Box utilities: IoU, coding round-trip, anchor assignment, fixed-shape NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.tasks.boxes import (
    assign_anchors,
    box_iou,
    decode_boxes,
    encode_boxes,
    nms,
)


def test_iou_basic():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(box_iou(a, b))
    assert iou[0, 0] == 1.0
    np.testing.assert_allclose(iou[0, 1], 25 / 175, rtol=1e-5)
    assert iou[1, 1] == 0.0


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    anchors = np.stack([rng.uniform(0, 50, 20), rng.uniform(0, 50, 20)], -1)
    anchors = np.concatenate([anchors, anchors + rng.uniform(5, 30, (20, 2))], -1)
    gt = anchors + rng.normal(0, 3, anchors.shape)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    deltas = encode_boxes(jnp.asarray(anchors, jnp.float32), jnp.asarray(gt, jnp.float32))
    back = np.asarray(decode_boxes(jnp.asarray(anchors, jnp.float32), deltas))
    np.testing.assert_allclose(back, gt, atol=1e-3)


def test_assignment():
    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30], [100, 100, 110, 110],
                           [0, 0, 9, 11]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [19, 19, 31, 31], [-1, -1, -1, -1]], jnp.float32)
    labels = jnp.asarray([3, 7, -1], jnp.int32)
    idx, lab, pos, valid = assign_anchors(anchors, gt, labels)
    assert bool(pos[0]) and int(lab[0]) == 3
    assert bool(pos[1]) and int(lab[1]) == 7
    assert not bool(pos[2]) and int(lab[2]) == -1 and bool(valid[2])  # clean negative
    # padded gt never matches
    assert int(idx[2]) in (0, 1, 2)


def test_assignment_force_match_survives_gt_padding():
    """Padded gts all argmax to anchor 0 on their zeroed iou column; they must
    not overwrite a real gt's force-match there (mmdet MaxIoUAssigner keeps the
    valid gt's best anchor positive regardless of padding)."""
    # the real gt's best anchor IS anchor 0, with IoU below pos_iou so only the
    # force-match path can make it positive
    anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 30],          # IoU with anchor0 = 1/3 < 0.5
                      [-1, -1, -1, -1],
                      [-1, -1, -1, -1]], jnp.float32)
    labels = jnp.asarray([4, -1, -1], jnp.int32)
    idx, lab, pos, valid = assign_anchors(anchors, gt, labels)
    assert bool(pos[0]), "force-match clobbered by padded gts"
    assert int(idx[0]) == 0 and int(lab[0]) == 4
    assert not bool(pos[1])


def test_nms():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    idx, mask = nms(boxes, scores, iou_thresh=0.5, max_out=3)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 2}  # box 1 suppressed by box 0


def test_nms_jittable():
    import jax

    boxes = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (32, 2)))
    boxes = jnp.concatenate([boxes, boxes + 10], axis=-1).astype(jnp.float32)
    scores = jnp.asarray(np.random.default_rng(1).uniform(0.1, 1, 32).astype(np.float32))
    idx, mask = jax.jit(lambda b, s: nms(b, s, max_out=8))(boxes, scores)
    assert idx.shape == (8,) and mask.shape == (8,)


def test_multiclass_nms_keeps_overlapping_distinct_classes():
    """Per-class NMS (mmdet multiclass_nms) must keep two heavily overlapping
    boxes of DIFFERENT classes, which class-agnostic best-class NMS suppresses."""
    from recnext_tpu.tasks.boxes import multiclass_nms

    boxes = jnp.asarray([[0., 0., 10., 10.],
                         [1., 1., 11., 11.],
                         [50., 50., 60., 60.]])
    probs = jnp.asarray([[0.9, 0.0],
                         [0.0, 0.8],
                         [0.7, 0.0]])
    bx, sc, lb, valid = multiclass_nms(boxes, probs, score_thresh=0.05,
                                       iou_thresh=0.5, max_out=4)
    kept = sorted(((float(s), int(l)) for s, l, v in zip(sc, lb, valid) if v),
                  reverse=True)
    np.testing.assert_allclose([s for s, _ in kept], [0.9, 0.8, 0.7], rtol=1e-6)
    assert [l for _, l in kept] == [0, 1, 0]
    # jittable + same result
    bx2, sc2, lb2, v2 = jax.jit(
        lambda b, p: multiclass_nms(b, p, max_out=4))(boxes, probs)
    np.testing.assert_allclose(np.asarray(sc2), np.asarray(sc))


def test_multiclass_nms_suppresses_same_class():
    from recnext_tpu.tasks.boxes import multiclass_nms

    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.]])
    probs = jnp.asarray([[0.9, 0.0], [0.8, 0.0]])
    _, sc, _, valid = multiclass_nms(boxes, probs, max_out=4)
    assert int(valid.sum()) == 1
    np.testing.assert_allclose(float(sc[0]), 0.9, rtol=1e-6)


def test_nms_matches_reference_greedy_on_random_boxes():
    """The scan-of-argmax NMS (round-4 rewrite: shared-IoU, no per-class sort)
    must select the exact same boxes, in the same order, as the textbook
    sort-then-suppress greedy NMS (torchvision.ops.nms semantics) over many
    random configurations — including duplicate boxes (tie-break = lowest
    index), zero-area boxes, and sub-threshold scores."""
    import numpy as np

    from recnext_tpu.tasks.boxes import box_iou, nms

    def reference_nms(boxes, scores, iou_thresh, max_out):
        order = np.argsort(-scores, kind="stable")
        iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
        kept = []
        for i in order:
            if scores[i] <= 0:
                continue
            if all(iou[i, j] <= iou_thresh for j in kept):
                kept.append(int(i))
            if len(kept) == max_out:
                break
        return kept

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(4, 64))
        xy = rng.uniform(0, 80, size=(n, 2)).astype(np.float32)
        wh = rng.uniform(0, 30, size=(n, 2)).astype(np.float32)  # 0 => degenerate
        boxes = np.concatenate([xy, xy + wh], axis=1)
        if trial % 3 == 0 and n >= 2:
            boxes[1] = boxes[0]  # exact duplicate: tie-break path
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        scores[rng.uniform(size=n) < 0.2] = 0.0  # sub-threshold slots
        max_out = int(rng.integers(1, 12))
        thr = float(rng.uniform(0.3, 0.7))

        idx, mask = jax.jit(
            lambda b, s: nms(b, s, iou_thresh=thr, max_out=max_out))(
                jnp.asarray(boxes), jnp.asarray(scores))
        got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
        want = reference_nms(boxes, scores, thr, max_out)
        assert got == want, (trial, got, want)
