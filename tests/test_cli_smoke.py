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


def test_train_det_cli_smoke(tmp_path):
    from recnext_tpu.tasks.train_det import main

    main(["--backbone", "recnext_m0", "--detector", "retinanet", "--num-classes", "4",
          "--epochs", "1", "--steps-per-epoch", "2", "--img-size", "64",
          "--batch-size", "2", "--output-dir", str(tmp_path)])
    rec = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["loss"])


def test_train_main_cli_smoke(tmp_path):
    from recnext_tpu.train.main import main

    res = main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "8",
                "--epochs", "1", "--batch-size", "8", "--input-size", "32",
                "--steps-per-epoch", "2", "--simple-aug", "--no-model-ema",
                "--output-dir", str(tmp_path)])
    assert "max_acc" in res
    assert (tmp_path / "summary.csv").exists() and (tmp_path / "args.yaml").exists()