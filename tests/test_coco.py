"""COCO pipeline tests: pure-numpy AP evaluator vs hand-checked fixtures, RLE/polygon
decoding, CocoDetection round-trip over a synthetic COCO-format folder, and the
end-to-end evaluate_detection loop (perfect predictor -> AP 1)."""

import json

import numpy as np
import pytest

from recnext_tpu.tasks.coco_eval import (
    COCOEvaluator,
    IOU_THRS,
    box_iou_np,
    mask_iou_np,
)


def _gt(boxes, labels, crowd=None, masks=None):
    g = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
         "labels": np.asarray(labels, np.int64),
         "iscrowd": np.asarray(crowd if crowd is not None
                               else [0] * len(labels), bool)}
    if masks is not None:
        g["masks"] = np.asarray(masks, np.uint8)
    return g


def _pred(boxes, scores, labels, masks=None):
    p = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
         "scores": np.asarray(scores, np.float64),
         "labels": np.asarray(labels, np.int64)}
    if masks is not None:
        p["masks"] = np.asarray(masks, np.uint8)
    return p


class TestEvaluator:
    def test_perfect_predictions(self):
        ev = COCOEvaluator(num_classes=3)
        boxes = [[0, 0, 50, 50], [60, 60, 120, 130]]
        ev.add(_gt(boxes, [0, 2]), _pred(boxes, [0.9, 0.8], [0, 2]))
        s = ev.summarize()
        assert s["bbox_mAP"] == pytest.approx(1.0)
        assert s["bbox_mAP_50"] == pytest.approx(1.0)
        assert s["bbox_mAP_75"] == pytest.approx(1.0)

    def test_hand_checked_ap(self):
        # 2 gts; dets sorted by score: TP(0.9), FP(0.8), TP(0.7)
        # PR: (r=.5,p=1), (r=.5,p=.5), (r=1,p=2/3); interp p=[1,2/3,2/3]
        # AP = (51*1 + 50*(2/3)) / 101
        ev = COCOEvaluator(num_classes=1)
        gtb = [[0, 0, 50, 50], [100, 100, 160, 160]]
        dtb = [[0, 0, 50, 50], [200, 200, 250, 250], [100, 100, 160, 160]]
        ev.add(_gt(gtb, [0, 0]), _pred(dtb, [0.9, 0.8, 0.7], [0, 0, 0]))
        want = (51 * 1.0 + 50 * (2 / 3)) / 101
        s = ev.summarize()
        assert s["bbox_mAP"] == pytest.approx(want, abs=1e-9)

    def test_missed_gt_halves_recall(self):
        ev = COCOEvaluator(num_classes=1)
        ev.add(_gt([[0, 0, 50, 50], [100, 100, 150, 150]], [0, 0]),
               _pred([[0, 0, 50, 50]], [0.9], [0]))
        # precision 1 up to recall .5, zero beyond -> AP = 51/101
        assert ev.summarize()["bbox_mAP"] == pytest.approx(51 / 101)

    def test_localization_quality_spreads_over_thresholds(self):
        # IoU between det and gt = 0.5/0.7... pick IoU ~ .64: 40x40 det on 50x50 gt
        ev = COCOEvaluator(num_classes=1)
        ev.add(_gt([[0, 0, 50, 50]], [0]), _pred([[0, 0, 40, 40]], [0.9], [0]))
        iou = (40 * 40) / (50 * 50)  # 0.64
        n_pass = int(np.sum(IOU_THRS <= iou + 1e-9))
        s = ev.summarize()
        assert s["bbox_mAP"] == pytest.approx(n_pass / len(IOU_THRS))
        assert s["bbox_mAP_50"] == pytest.approx(1.0)
        assert s["bbox_mAP_75"] == pytest.approx(0.0)

    def test_crowd_matches_are_ignored_not_fp(self):
        ev = COCOEvaluator(num_classes=1)
        # det overlaps only the crowd region: must be ignored, not counted FP
        ev.add(_gt([[0, 0, 100, 100], [200, 200, 260, 260]], [0, 0],
                   crowd=[1, 0]),
               _pred([[10, 10, 60, 60], [200, 200, 260, 260]], [0.9, 0.8], [0, 0]))
        # crowd IoU = inter/area(det) = 1.0 -> matched+ignored; other det TP
        assert ev.summarize()["bbox_mAP"] == pytest.approx(1.0)

    def test_per_category_independence(self):
        ev = COCOEvaluator(num_classes=2)
        # cat0 perfect; a cat1 det on the cat0 gt is a cat1 FP with no cat1 gt
        # anywhere -> cat1 has no gts, excluded from the mean
        ev.add(_gt([[0, 0, 50, 50]], [0]),
               _pred([[0, 0, 50, 50], [0, 0, 50, 50]], [0.9, 0.8], [0, 1]))
        assert ev.summarize()["bbox_mAP"] == pytest.approx(1.0)

    def test_area_ranges(self):
        ev = COCOEvaluator(num_classes=1)
        small = [0, 0, 20, 20]      # 400 < 32^2
        large = [0, 0, 200, 200]    # > 96^2
        ev.add(_gt([small, large], [0, 0]),
               _pred([small, large], [0.9, 0.8], [0, 0]))
        s = ev.summarize()
        assert s["bbox_mAP_s"] == pytest.approx(1.0)
        assert s["bbox_mAP_l"] == pytest.approx(1.0)
        assert np.isnan(s["bbox_mAP_m"])

    def test_area_ranges_use_mask_area_when_masks_exist(self):
        """pycocotools gates area ranges on ann['area'] (the MASK pixel area
        for instances) in BOTH bbox and segm eval, and the same area feeds the
        recall denominator. A thin diagonal-ish object (large bbox, small mask)
        must count as SMALL everywhere — a bbox-area denominator with a
        mask-area gate lets tps/npig exceed 1."""
        H = W = 128
        thin = np.zeros((H, W), np.uint8)
        thin[10:110, 10:14] = 1  # mask area 400 (< 32^2) inside a 100x100 bbox
        gt = _gt([[10, 10, 110, 110]], [0], masks=[thin])
        pred = _pred([[10, 10, 110, 110]], [0.9], [0], masks=[thin])
        ev = COCOEvaluator(num_classes=1)
        ev.add(gt, pred)
        s = ev.summarize()
        for pre in ("bbox", "segm"):
            assert s[f"{pre}_mAP_s"] == pytest.approx(1.0), pre
            assert np.isnan(s[f"{pre}_mAP_l"]), pre  # no large gts at all

    def test_mask_ap(self):
        H = W = 64
        m1 = np.zeros((H, W), np.uint8)
        m1[10:30, 10:30] = 1
        m2 = np.zeros((H, W), np.uint8)
        m2[40:60, 40:60] = 1
        gt = _gt([[10, 10, 30, 30], [40, 40, 60, 60]], [0, 0],
                 masks=[m1, m2])
        # pred mask 1 exact; pred mask 2 half-overlaps (mask IoU exactly 0.5:
        # matches at t=0.50 only, FP at all higher thresholds)
        m2p = np.zeros((H, W), np.uint8)
        m2p[40:60, 40:50] = 1
        pred = _pred([[10, 10, 30, 30], [40, 40, 60, 50]], [0.9, 0.8], [0, 0],
                     masks=[m1, m2p])
        ev = COCOEvaluator(num_classes=1)
        ev.add(gt, pred)
        s = ev.summarize()
        assert s["segm_mAP_50"] == pytest.approx(1.0)
        # t>0.5: det order TP(0.9), FP(0.8) -> AP = 51/101
        assert s["segm_mAP"] == pytest.approx((1.0 + 9 * (51 / 101)) / 10)
        assert s["bbox_mAP_50"] == pytest.approx(1.0)

    def test_iou_helpers(self):
        a = np.array([[0, 0, 10, 10]], np.float64)
        b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float64)
        iou = box_iou_np(a, b, np.zeros(2, bool))
        assert iou[0, 0] == pytest.approx(1.0)
        assert iou[0, 1] == pytest.approx(25 / 175)
        # crowd: inter / det area
        iou_c = box_iou_np(a, b, np.ones(2, bool))
        assert iou_c[0, 1] == pytest.approx(25 / 100)
        ma = np.zeros((1, 8, 8), bool)
        ma[0, :4] = True
        mb = np.zeros((1, 8, 8), bool)
        mb[0, 2:6] = True
        assert mask_iou_np(ma, mb, np.zeros(1, bool))[0, 0] == pytest.approx(
            16 / 48)


def _rle_runs(mask: np.ndarray) -> list:
    """Column-major COCO RLE runs (starting with the zero-run) for a binary mask."""
    runs, prev, count = [], 0, 0
    for v in mask.T.reshape(-1):
        if v == prev:
            count += 1
        else:
            runs.append(count)
            prev, count = v, 1
    runs.append(count)
    return runs


class TestSegDecoding:
    def test_uncompressed_rle_roundtrip(self):
        from recnext_tpu.data.coco import ann_to_mask

        m = np.zeros((4, 6), np.uint8)
        m[1:3, 2:5] = 1
        out = ann_to_mask({"size": [4, 6], "counts": _rle_runs(m)}, 4, 6)
        np.testing.assert_array_equal(out, m)

    def test_compressed_rle(self):
        # encode with the pycocotools LEB128 scheme, decode back
        from recnext_tpu.data.coco import decode_compressed_rle

        def encode(runs):
            s = []
            for i, x in enumerate(runs):
                if i > 2:
                    x -= runs[i - 2]
                more = True
                while more:
                    c = x & 0x1F
                    x >>= 5
                    more = not (x == 0 and not (c & 0x10)
                                or x == -1 and (c & 0x10))
                    if more:
                        c |= 0x20
                    s.append(chr(c + 48))
            return "".join(s)

        m = np.zeros((7, 5), np.uint8)
        m[2:5, 1:4] = 1
        m[0, 0] = 1
        out = decode_compressed_rle(encode(_rle_runs(m)), 7, 5)
        np.testing.assert_array_equal(out, m)

    def test_polygon(self):
        from recnext_tpu.data.coco import ann_to_mask

        m = ann_to_mask([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
        assert m.shape == (12, 14)
        assert m[5, 5] == 1 and m[0, 0] == 0
        assert m.sum() >= 7 * 6  # filled rectangle incl. outline


@pytest.fixture
def coco_folder(tmp_path):
    """Synthetic 3-image COCO-format dataset on disk."""
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    sizes = [(80, 60), (50, 70), (64, 64)]
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"img{i}.png")
        images.append({"id": i + 10, "file_name": f"img{i}.png",
                       "width": w, "height": h})
        for j in range(i + 1):
            x, y = 5 + 10 * j, 5 + 5 * j
            bw, bh = 20, 15
            annotations.append({
                "id": aid, "image_id": i + 10, "category_id": (j % 2) * 3 + 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "thing"}, {"id": 4, "name": "stuff"}]}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


class TestCocoDetection:
    def test_loading_and_shapes(self, coco_folder):
        from recnext_tpu.data.coco import CocoDetection, collate_det

        img_dir, ann_file = coco_folder
        ds = CocoDetection(img_dir, ann_file, img_size=96, max_gt=8,
                           with_masks=True, train=False)
        assert ds.nb_classes == 2
        assert len(ds) == 3
        s = ds[0]
        assert s["image"].shape == (96, 96, 3)
        assert s["gt_boxes"].shape == (8, 4)
        assert s["gt_masks"].shape == (8, 96, 96)
        assert (s["gt_labels"] >= 0).sum() == 1
        batch = collate_det([ds[0], ds[1]])
        assert batch["image"].shape == (2, 96, 96, 3)
        assert batch["scale"].shape == (2,)

    def test_boxes_scaled_and_mask_aligned(self, coco_folder):
        from recnext_tpu.data.coco import CocoDetection

        img_dir, ann_file = coco_folder
        ds = CocoDetection(img_dir, ann_file, img_size=96, max_gt=8,
                           with_masks=True, train=False)
        s = ds[0]  # 80x60 image -> scale 96/80 = 1.2
        assert s["scale"] == pytest.approx(1.2)
        np.testing.assert_allclose(s["gt_boxes"][0],
                                   np.array([5, 5, 25, 20]) * 1.2, atol=1.0)
        # mask support roughly inside the box
        x1, y1, x2, y2 = s["gt_boxes"][0].astype(int)
        m = s["gt_masks"][0]
        assert m[y1 + 2:y2 - 2, x1 + 2:x2 - 2].mean() > 0.9
        assert m[(y2 + 5):, :].sum() == 0

    def test_gt_for_eval_original_coords(self, coco_folder):
        from recnext_tpu.data.coco import CocoDetection

        img_dir, ann_file = coco_folder
        ds = CocoDetection(img_dir, ann_file, img_size=96, train=False,
                           with_masks=False)
        g = ds.gt_for_eval(2)
        assert g["boxes"].shape == (3, 4)
        np.testing.assert_allclose(g["boxes"][0], [5, 5, 25, 20])

    def test_labels_contiguous(self, coco_folder):
        from recnext_tpu.data.coco import CocoDetection

        img_dir, ann_file = coco_folder
        ds = CocoDetection(img_dir, ann_file, img_size=96, train=False,
                           with_masks=False)
        s = ds[2]
        labs = s["gt_labels"][s["gt_labels"] >= 0]
        assert set(labs.tolist()) == {0, 1}  # ids 1,4 -> 0,1


class TestEvaluateDetection:
    def test_perfect_predictor_gets_ap1(self):
        """evaluate_detection end-to-end: feeding the gt back as predictions."""
        import jax.numpy as jnp

        from recnext_tpu.tasks.train_det import FakeDetDataset, evaluate_detection

        ds = FakeDetDataset(6, 64, num_classes=3, seed=1)
        D = 10

        def predict_fn(images):
            del images
            # the loop walks the dataset in order; pop gts for the next batch
            boxes = np.zeros((2, D, 4), np.float32)
            scores = np.zeros((2, D), np.float32)
            labels = np.zeros((2, D), np.int32)
            valid = np.zeros((2, D), bool)
            for b in range(2):
                g = ds.gt_for_eval(predict_fn.i)
                predict_fn.i = (predict_fn.i + 1) % len(ds)
                n = len(g["labels"])
                boxes[b, :n] = g["boxes"]
                scores[b, :n] = 0.9
                labels[b, :n] = g["labels"]
                valid[b, :n] = True
            return (jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(labels), None, jnp.asarray(valid))

        predict_fn.i = 0
        stats = evaluate_detection(ds, predict_fn, batch_size=2, with_mask=False)
        assert stats["bbox_mAP"] == pytest.approx(1.0)

    def test_paste_masks_roundtrip(self):
        from recnext_tpu.tasks.mask_rcnn import paste_masks

        mp = np.ones((1, 14, 14), np.float32)
        out = paste_masks(mp, np.array([[10, 20, 30, 40]], np.float32),
                          (100, 80), scale=1.0)
        assert out.shape == (1, 100, 80)
        assert out[0, 25, 15] == 1
        assert out[0, 25, 35] == 0 and out[0, 50, 15] == 0
        # scale mapping: canvas coords / 2 -> original
        out2 = paste_masks(mp, np.array([[20, 40, 60, 80]], np.float32),
                           (100, 80), scale=2.0)
        np.testing.assert_array_equal(out, out2)
