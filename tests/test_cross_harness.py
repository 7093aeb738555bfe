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


def test_torchvision_stub_arithmetic_pins():
    """Pin the torchvision-stub resize/crop math with hand-computed values
    quoting the torchvision source it mirrors (ADVICE r4: the cross-harness
    guarantee is only as strong as this stub; re-run against real torchvision
    whenever an environment has it)."""
    import numpy as np
    from PIL import Image

    from tests.torch_ref import _install_torchvision_stub

    _install_torchvision_stub()
    import sys

    tfm = sys.modules["torchvision.transforms"]

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (333, 500, 3), np.uint8))  # w=500 h=333

    # torchvision/transforms/functional.py::_compute_resized_output_size:
    #   short -> size, long -> int(size * long / short)  [int-TRUNCATION]
    # 500x333 @ size=236: long = int(236 * 500 / 333) = int(354.35...) = 354
    out = tfm.Resize(236, interpolation=3)(img)
    assert out.size == (354, 236)

    # F.resize same-size short-circuit: "if [h, w] == output_size: return img"
    # (a same-size bicubic resample is NOT the identity; object identity pins it)
    small = Image.fromarray(rng.integers(0, 255, (300, 236, 3), np.uint8))
    assert tfm.Resize(236, interpolation=3)(small) is small

    # tuple size is exact, no aspect preservation
    assert tfm.Resize((224, 224), interpolation=3)(img).size == (224, 224)

    # torchvision/transforms/functional.py::center_crop:
    #   crop_top  = int(round((image_height - crop_height) / 2.0))
    #   crop_left = int(round((image_width  - crop_width)  / 2.0))
    # 235x233 @ 224: left = int(round(11/2)) = int(round(5.5)) = 6 (banker's),
    #                top  = int(round(9/2))  = int(round(4.5)) = 4 (banker's)
    odd = Image.fromarray(rng.integers(0, 255, (233, 235, 3), np.uint8))
    ref = odd.crop((6, 4, 6 + 224, 4 + 224))
    got = tfm.CenterCrop(224)(odd)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # ToTensor: CHW float division by 255 (functional.py::to_tensor)
    t = tfm.ToTensor()(odd)
    assert t.shape == (3, 233, 235) and abs(float(t.max()) - np.asarray(odd).max() / 255.0) < 1e-7

    # Normalize: (x - mean) / std, per-channel
    n = tfm.Normalize([0.5, 0.5, 0.5], [0.25, 0.25, 0.25])(t)
    np.testing.assert_allclose(n.numpy(), (t.numpy() - 0.5) / 0.25, rtol=1e-6)
