"""Cross-harness end-to-end eval loop (the last executable parity seam).

A checkpoint produced in THIS framework is exported with the reverse
converters and evaluated by the REFERENCE'S OWN eval stack — its
data/datasets.py:102-140 torchvision transforms + engine.py:79-109 evaluate(),
consumed both the `main.py --eval` way (state-dict load) and the
`fuse_eval.py:33-55` way (fused + torch.jit round-trip) — over the same
on-disk image folder that our validate.py scores. Top-1/top-5 must agree to
the last reported decimal.

tests/test_convert_reverse.py proves logits parity on tensors; this closes the
data-pipeline seam: JPEG decode (PIL on both sides), short-side resize + center
crop rounding, normalize constants, class mapping/label order, and the
accuracy computation. The torchvision/timm modules are faithful stubs
(tests/torch_ref.py) since torchvision is not installed here — the pixel math
is PIL's in both harnesses, the transform ARITHMETIC is the seam under test
(it already caught two 1px rounding divergences, see
transforms.center_crop_rect docstring).
"""

from __future__ import annotations

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from recnext_tpu.convert import flax_fused_to_torch, flax_to_torch
from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.registry import get_config
from recnext_tpu.models.recnext import RecNext
from tests.test_convert_reverse import _load_strict, _random_variables
from tests.test_models import _torch_model
from tests.torch_ref import load_ref_eval_harness

N_CLASSES, PER_CLASS = 4, 12


def _make_folder_dataset(root):
    """root/val/class_*/img_*.jpg with awkward sizes: non-square aspect ratios
    (long-side truncation seam), odd resized-minus-224 diffs (center-crop
    rounding seam, diff ≡ 3 mod 4 included)."""
    from PIL import Image

    rng = np.random.default_rng(42)
    sizes = [(320, 247), (283, 311), (256, 341), (299, 257), (241, 239),
             (337, 251)]
    for c in range(N_CLASSES):
        d = root / "val" / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(PER_CLASS):
            w, h = sizes[(c * PER_CLASS + i) % len(sizes)]
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.jpg", quality=90)


@pytest.mark.slow
def test_reference_harness_scores_our_export_identically(tmp_path):
    build_dataset, evaluate = load_ref_eval_harness()

    data_root = tmp_path / "data"
    _make_folder_dataset(data_root)

    cfg = get_config("recnext_m0", num_classes=N_CLASSES)
    fm = RecNext(cfg=cfg)
    variables = _random_variables(fm, seed=5)

    # ---- our side: orbax checkpoint -> validate.py (unfused, fused, packed)
    import orbax.checkpoint as ocp

    from recnext_tpu import validate

    ckpt_dir = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir.resolve(), jax.tree.map(np.asarray, variables))
    ckptr.wait_until_finished()

    base_argv = ["--model", "recnext_m0", "--checkpoint", str(ckpt_dir),
                 "--data-set", "FOLDER", "--data-path", str(data_root),
                 "--batch-size", "16"]
    ours = validate.main(base_argv)
    ours_fused = validate.main(base_argv + ["--fused"])
    ours_packed = validate.main(base_argv + ["--fused", "--packed"])

    # ---- reference side: its own dataset+transform+evaluate over the export
    ref_args = argparse.Namespace(data_set="IMNET", data_path=str(data_root),
                                  input_size=224, finetune="")
    dataset_val, nb = build_dataset(is_train=False, args=ref_args)
    assert nb == 1000  # the reference hardcodes IMNET classes; logits are 4-wide
    assert len(dataset_val) == N_CLASSES * PER_CLASS
    loader = torch.utils.data.DataLoader(dataset_val, batch_size=16,
                                         shuffle=False, num_workers=0)

    # main.py --eval consumption: unfused state dict, strict load
    tm = _torch_model("m", cfg).eval()
    _load_strict(tm, flax_to_torch(variables))
    with torch.no_grad():
        ref_stats = evaluate(loader, tm, torch.device("cpu"))

    assert round(ref_stats["acc1"], 3) == ours["top1"]
    assert round(ref_stats["acc5"], 3) == ours["top5"]

    # fuse_eval.py consumption: fused export -> strict load into the fused
    # reference module -> torch.jit round-trip (fuse_eval.py:49 loads a jit
    # archive) -> the same evaluate()
    tm.fuse()
    _load_strict(tm, flax_fused_to_torch(fuse_params(variables), family="m"))
    with torch.no_grad():
        traced = torch.jit.trace(tm, torch.randn(1, 3, 224, 224))
    jit_path = str(tmp_path / "m0_fused_jit.pt")
    traced.save(jit_path)
    jm = torch.jit.load(jit_path, map_location="cpu")
    with torch.no_grad():
        ref_fused_stats = evaluate(loader, jm, torch.device("cpu"))

    assert round(ref_fused_stats["acc1"], 3) == ours_fused["top1"]
    assert round(ref_fused_stats["acc5"], 3) == ours_fused["top5"]
    # the packed executor is exact vs the fused model, so it must agree too
    assert ours_packed["top1"] == ours_fused["top1"]
    assert ours_packed["top5"] == ours_fused["top5"]
