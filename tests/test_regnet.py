"""RegNetY teacher tests: width-rule derivation vs the published RegNetY-16GF
config, parameter-count parity with timm's regnety_160 (83.6M), and golden output
parity against an independently-written torch oracle through the state-dict
converter (the same oracle strategy as tests/test_models.py uses for RecNext)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from recnext_tpu.convert import regnety_torch_to_flax
from recnext_tpu.models.regnet import (
    REGNET_CONFIGS,
    RegNetConfig,
    RegNetY,
    create_regnet,
)


def test_regnety_160_stage_derivation():
    ws, ds, gs = REGNET_CONFIGS["regnety_160"].stages()
    assert ws == [224, 448, 1232, 3024]
    assert ds == [2, 4, 11, 1]
    assert gs == [112, 112, 112, 112]


def test_regnety_160_param_count():
    model = create_regnet("regnety_160")
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))
    n = sum(np.prod(s.shape) for s in jax.tree.leaves(shapes["params"]))
    assert n / 1e6 == pytest.approx(83.59, abs=0.05)  # timm regnety_160: 83.6M


# --- independent torch oracle (timm state-dict naming) -----------------------

class TConvBn(tnn.Module):
    def __init__(self, cin, cout, k=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, pad, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TSE(tnn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, rd, 1)
        self.fc2 = tnn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class TBlock(tnn.Module):
    def __init__(self, cin, cout, stride, gw, se_ratio=0.25):
        super().__init__()
        groups = max(1, cout // gw)
        self.conv1 = TConvBn(cin, cout)
        self.conv2 = TConvBn(cout, cout, 3, stride, 1, groups=groups)
        self.se = TSE(cout, max(1, int(round(cin * se_ratio))))
        self.conv3 = TConvBn(cout, cout)
        self.need_ds = stride != 1 or cin != cout
        if self.need_ds:
            self.downsample = TConvBn(cin, cout, 1, stride)

    def forward(self, x):
        y = torch.relu(self.conv1(x))
        y = torch.relu(self.conv2(y))
        y = self.se(y)
        y = self.conv3(y)
        sc = self.downsample(x) if self.need_ds else x
        return torch.relu(y + sc)


class THead(tnn.Module):
    def __init__(self, cin, nc):
        super().__init__()
        self.fc = tnn.Linear(cin, nc)

    def forward(self, x):
        return self.fc(x.mean((2, 3)))


class TRegNetY(tnn.Module):
    def __init__(self, cfg: RegNetConfig):
        super().__init__()
        self.stem = TConvBn(3, cfg.stem_width, 3, 2, 1)
        ws, ds, gs = cfg.stages()
        cin = cfg.stem_width
        for si, (w, d, g) in enumerate(zip(ws, ds, gs)):
            stage = tnn.Module()
            for bi in range(d):
                stage.add_module(f"b{bi + 1}",
                                 TBlock(cin, w, 2 if bi == 0 else 1, g,
                                        cfg.se_ratio))
                cin = w
            self.add_module(f"s{si + 1}", stage)
        self.head = THead(cin, cfg.num_classes)
        self.ws = ws

    def forward(self, x):
        x = torch.relu(self.stem(x))
        for si in range(len(self.ws)):
            stage = getattr(self, f"s{si + 1}")
            for blk in stage.children():
                x = blk(x)
        return self.head(x)


TINY = RegNetConfig("tiny", w0=24, wa=24.0, wm=2.0, depth=4, group_width=8,
                    stem_width=16, num_classes=11)


@torch.no_grad()
def test_golden_parity_vs_torch_oracle(rng):
    torch.manual_seed(0)
    tmodel = TRegNetY(TINY)
    # randomize BN running stats so eval mode is non-trivial
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.3)
            m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    tmodel.eval()

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ty = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    fmodel = RegNetY(cfg=TINY)
    fvars = regnety_torch_to_flax(tmodel.state_dict())
    fy = fmodel.apply(fvars, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(fy), ty, atol=2e-5, rtol=1e-5)


@torch.no_grad()
def test_converter_covers_every_torch_param():
    tmodel = TRegNetY(TINY)
    fvars = regnety_torch_to_flax(tmodel.state_dict())
    fmodel = RegNetY(cfg=TINY)
    want = jax.eval_shape(fmodel.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3)))
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(fvars)}
    want_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(
                      {"params": want["params"],
                       "batch_stats": want["batch_stats"]})}
    assert got_paths == want_paths


def test_teacher_cli_wiring(tmp_path):
    """--teacher-model regnety_* trains the hard-distillation CLI end-to-end."""
    import json

    from recnext_tpu.train.main import main

    tmodel = TRegNetY(RegNetConfig("tiny", w0=24, wa=24.0, wm=2.0, depth=4,
                                   group_width=8, stem_width=16, num_classes=8))
    ck = tmp_path / "teacher.pth"
    torch.save({"model": tmodel.state_dict()}, ck)
    import recnext_tpu.models.regnet as regnet_mod

    regnet_mod.REGNET_CONFIGS["regnety_tiny_test"] = RegNetConfig(
        "regnety_tiny_test", w0=24, wa=24.0, wm=2.0, depth=4, group_width=8,
        stem_width=16)
    try:
        res = main(["--model", "recnext_m0", "--data-set", "FAKE",
                    "--fake-classes", "8", "--epochs", "1", "--batch-size", "8",
                    "--input-size", "32", "--steps-per-epoch", "2",
                    "--simple-aug", "--no-model-ema",
                    "--distillation-type", "hard",
                    "--teacher-model", "regnety_tiny_test",
                    "--teacher-ckpt", str(ck),
                    "--output-dir", str(tmp_path / "run")])
    finally:
        del regnet_mod.REGNET_CONFIGS["regnety_tiny_test"]
    assert "max_acc" in res
    rec = json.loads((tmp_path / "run" / "log.txt").read_text()
                     .strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
