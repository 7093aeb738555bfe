"""CLI integration smokes: the task trainers run end-to-end in-process (the
dist_train_cifar.sh-style integration tests, SURVEY.md §4.4)."""

import json

import numpy as np


def test_train_seg_cli_smoke(tmp_path):
    from recnext_tpu.tasks.train_seg import main

    main(["--backbone", "recnext_m0", "--num-classes", "5", "--iters", "2",
          "--eval-every", "2", "--crop", "32", "--batch-size", "2",
          "--output-dir", str(tmp_path)])
    lines = (tmp_path / "log.txt").read_text().strip().splitlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss"]) and rec["iter"] == 2


def test_train_det_cli_smoke_with_eval_and_resume(tmp_path):
    from recnext_tpu.tasks.train_det import main

    argv = ["--backbone", "recnext_m0", "--detector", "retinanet",
            "--num-classes", "4", "--steps-per-epoch", "2", "--img-size", "64",
            "--batch-size", "2", "--fake-size", "4", "--eval-every", "1",
            "--eval-max-images", "4", "--output-dir", str(tmp_path)]
    main(argv + ["--epochs", "1"])
    rec = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    assert "bbox_mAP" in rec and 0.0 <= rec["bbox_mAP"] <= 1.0
    # auto-resume continues from the saved epoch instead of restarting
    main(argv + ["--epochs", "2", "--resume"])
    lines = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert json.loads(lines[-1])["epoch"] == 1 and len(lines) == 2


def test_train_det_cli_coco_folder(tmp_path):
    """--data-set COCO end-to-end over a tiny on-disk COCO-format dataset,
    Mask R-CNN with masks, AP eval from the same annotations."""
    from PIL import Image

    from recnext_tpu.tasks.train_det import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 56, 3), np.uint8)).save(
            img_dir / f"{i}.png")
        images.append({"id": i, "file_name": f"{i}.png", "width": 56,
                       "height": 48})
        annotations.append({"id": i + 1, "image_id": i, "category_id": 1,
                            "bbox": [8, 8, 24, 20], "area": 480, "iscrowd": 0,
                            "segmentation": [[8, 8, 32, 8, 32, 28, 8, 28]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "box"}]}))

    out = tmp_path / "run"
    main(["--backbone", "recnext_m0", "--detector", "mask_rcnn", "--with-mask",
          "--data-set", "COCO", "--ann-file", str(ann), "--img-dir", str(img_dir),
          "--val-ann-file", str(ann), "--val-img-dir", str(img_dir),
          "--epochs", "1", "--img-size", "64", "--batch-size", "2",
          "--num-proposals", "16", "--max-gt", "4", "--eval-every", "1",
          "--output-dir", str(out)])
    rec = json.loads((out / "log.txt").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    assert "bbox_mAP" in rec and "segm_mAP" in rec


def test_train_main_cli_smoke(tmp_path):
    from recnext_tpu.train.main import main

    # default EMA stays ON: the same run covers the single-pass raw+EMA eval
    # (timm --model-ema-eval counterpart) without a second train compile
    res = main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "8",
                "--epochs", "1", "--batch-size", "8", "--input-size", "32",
                "--steps-per-epoch", "2", "--simple-aug",
                "--output-dir", str(tmp_path)])
    assert "max_acc" in res
    assert (tmp_path / "summary.csv").exists() and (tmp_path / "args.yaml").exists()
    rec = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1])
    # reference per-epoch log keys (logs/normal/*.txt) for log-replay validation
    assert {"train_lr", "train_loss", "test_loss", "test_acc1", "test_acc5",
            "ema_test_acc1", "ema_test_acc5"} <= set(rec)


def test_train_main_cli_grain_loader(tmp_path):
    from recnext_tpu.train.main import main

    res = main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "8",
                "--epochs", "1", "--batch-size", "8", "--input-size", "32",
                "--steps-per-epoch", "2", "--simple-aug", "--no-model-ema",
                "--loader", "grain", "--workers", "0",
                "--output-dir", str(tmp_path)])
    assert "max_acc" in res

def test_train_det_cli_eval_only_and_benchmark(tmp_path):
    """--eval-only (detection/test.py role) restores the checkpoint and reports
    AP without training; --benchmark reports inference images/sec."""
    from recnext_tpu.tasks.train_det import main

    argv = ["--backbone", "recnext_m0", "--detector", "retinanet",
            "--num-classes", "4", "--steps-per-epoch", "2", "--img-size", "64",
            "--batch-size", "2", "--fake-size", "4", "--eval-every", "0",
            "--output-dir", str(tmp_path)]
    main(argv + ["--epochs", "1"])
    rec = main(argv + ["--eval-only", "--eval-max-images", "4"])
    assert rec["epoch"] == 0 and "bbox_mAP" in rec
    rec = main(argv + ["--benchmark", "2"])
    assert rec["images_per_sec"] > 0


def test_train_seg_cli_resume_eval_only_benchmark(tmp_path):
    """Seg CLI orbax checkpointing: --resume continues from the saved iter,
    --eval-only (tools/test.py role) and --benchmark (tools/benchmark.py role)."""
    from recnext_tpu.tasks.train_seg import main

    argv = ["--backbone", "recnext_m0", "--num-classes", "5", "--crop", "32",
            "--batch-size", "2", "--eval-every", "2", "--output-dir", str(tmp_path)]
    main(argv + ["--iters", "2"])
    assert (tmp_path / "ckpt").exists()
    main(argv + ["--iters", "4", "--resume"])
    recs = [json.loads(l) for l in
            (tmp_path / "log.txt").read_text().strip().splitlines()]
    assert [r["iter"] for r in recs] == [2, 4]  # resumed, not restarted
    rec = main(argv + ["--iters", "4", "--eval-only"])
    assert rec["iter"] == 4 and "mIoU" in rec
    rec = main(argv + ["--iters", "4", "--benchmark", "2"])
    assert rec["images_per_sec"] > 0
