"""Finetune / transfer warm-start tests.

Covers the reference's --finetune semantics (/root/reference/main.py:145-148,
278-294): weights-only load, head-shape-mismatch drop, strict=False merge; plus
the fused-artifact inverse embedding (fusion.defuse_params) that lets a
published deployment checkpoint warm-start the trainable model exactly.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.fusion import defuse_params, fuse_params
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.train.finetune import _flatten, load_pretrained, warm_start

SMALL = {
    "m": RecNextConfig(name="small_m", family="m", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 1), mlp_ratio=(2, 2, 2, 2), num_classes=10),
    "a": RecNextConfig(name="small_a", family="a", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 1), mlp_ratio=(1.875,) * 4, num_classes=10),
    "l": RecNextConfig(name="small_l", family="l", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 2), mlp_ratio=(2, 2, 2, 1.5),
                       num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4),
                       num_classes=10),
}


def _random_variables(model, x, seed=0):
    """Init + randomize every leaf (BN var kept positive) so the fuse/defuse
    round trip sees non-trivial statistics."""
    variables = model.init(jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        a = np.asarray(leaf)
        if path[-1] == "var":
            return jnp.asarray(0.75 + 0.5 * rng.random(a.shape, np.float32))
        return jnp.asarray(0.1 * rng.standard_normal(a.shape).astype(a.dtype)
                           if np.issubdtype(a.dtype, np.floating) else a)

    flat = {p: rand(p, l) for p, l in _flatten(variables).items()}
    out = {}
    for p, l in flat.items():
        node = out
        for k in p[:-1]:
            node = node.setdefault(k, {})
        node[p[-1]] = l
    return out


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_defuse_roundtrip(family):
    """fuse(defuse(f)) == f exactly AND the defused unfused model computes the
    fused model's function — the published-*_fused.pt warm-start guarantee."""
    cfg = SMALL[family]
    model = RecNext(cfg=cfg)
    fused_model = RecNext(cfg=cfg, fused=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    variables = _random_variables(model, x[:1])
    fused = fuse_params(variables)

    defused = defuse_params(fused["params"], variables)
    # same treedef as a fresh init (loadable into the model)
    assert jax.tree_util.tree_structure(defused) == \
        jax.tree_util.tree_structure(jax.tree.map(np.asarray, variables))
    refused = fuse_params(defused)
    for p, leaf in _flatten(fused).items():
        np.testing.assert_allclose(np.asarray(_flatten(refused)[p]),
                                   np.asarray(leaf), rtol=1e-6, atol=1e-6,
                                   err_msg=".".join(p))
    y_fused = fused_model.apply(fused, x, training=False)
    y_defused = model.apply(defused, x, training=False)
    np.testing.assert_allclose(np.asarray(y_defused), np.asarray(y_fused),
                               rtol=2e-5, atol=2e-5)


def test_warm_start_drops_mismatched_head():
    import dataclasses

    cfg10 = SMALL["m"]
    cfg4 = dataclasses.replace(cfg10, num_classes=4)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    src = _random_variables(RecNext(cfg=cfg10), x, seed=2)
    tmpl = RecNext(cfg=cfg4).init(jax.random.PRNGKey(3), x)

    msgs = []
    merged = warm_start(jax.device_get(tmpl), jax.device_get(src), log=msgs.append)
    mflat, tflat, sflat = _flatten(merged), _flatten(tmpl), _flatten(src)
    dropped = [p for p in mflat
               if np.shape(sflat[p]) != np.shape(tflat[p])]
    assert dropped, "class-count change must produce dropped head leaves"
    for p in mflat:
        if p in dropped:  # head: kept at template init
            np.testing.assert_array_equal(mflat[p], np.asarray(tflat[p]))
            assert "head" in ".".join(p)
        else:  # backbone: taken from the checkpoint
            np.testing.assert_array_equal(mflat[p], np.asarray(sflat[p]))
    assert any("Removing key" in m for m in msgs)


def test_warm_start_rejects_foreign_tree():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    tmpl = jax.device_get(RecNext(cfg=SMALL["m"]).init(jax.random.PRNGKey(0), x))
    with pytest.raises(SystemExit):
        warm_start(tmpl, {"params": {"something": np.zeros((3,))}}, log=lambda m: None)


def test_load_pretrained_torch_raw_roundtrip(tmp_path):
    """flax -> reference torch state dict -> --finetune load: exact tree match
    (the raw-checkpoint branch, detected via intact ConvNorm/NormLinear)."""
    torch = pytest.importorskip("torch")
    from recnext_tpu.convert import flax_to_torch
    from recnext_tpu.models.registry import create_model

    model = create_model("recnext_m0", num_classes=6)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = _random_variables(model, x, seed=4)
    sd = flax_to_torch(jax.device_get(variables))
    p = tmp_path / "ckpt.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, p)

    loaded = load_pretrained(str(p), jax.device_get(variables), family="m",
                             log=lambda m: None)
    for path, leaf in _flatten(jax.device_get(variables)).items():
        np.testing.assert_allclose(np.asarray(_flatten(loaded)[path]),
                                   np.asarray(leaf), rtol=1e-6, atol=1e-7,
                                   err_msg=".".join(path))


def test_load_pretrained_fused_pt(tmp_path):
    """A published *_fused.pt warm-starts the unfused model via defuse: the
    warm-started model's own fused form reproduces the artifact."""
    torch = pytest.importorskip("torch")
    from recnext_tpu.convert import flax_fused_to_torch
    from recnext_tpu.models.registry import create_model

    model = create_model("recnext_m0", num_classes=6)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = _random_variables(model, x, seed=5)
    fused = fuse_params(jax.device_get(variables))
    sd = flax_fused_to_torch(fused["params"], "m")
    p = tmp_path / "recnext_m0_fused.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, p)

    tmpl = jax.device_get(model.init(jax.random.PRNGKey(6), x))
    loaded = load_pretrained(str(p), tmpl, family="m", log=lambda m: None)
    refused = fuse_params(loaded)
    for path, leaf in _flatten(fused).items():
        np.testing.assert_allclose(np.asarray(_flatten(refused)[path]),
                                   np.asarray(leaf), rtol=1e-5, atol=1e-5,
                                   err_msg=".".join(path))


def test_finetune_cli_transfer(tmp_path):
    """End-to-end: pretrain on FAKE (8 color classes) at 32², then --finetune at
    48² with a DIFFERENT class count — the warm start must beat a from-scratch
    run given the identical (tiny) finetune budget. FakeData's class-color
    signal makes the backbone genuinely transferable (data/datasets.py:113)."""
    from recnext_tpu.train.main import main

    pre = tmp_path / "pretrain"
    teacher = tmp_path / "weights"
    # --warmup-epochs 0 + big nominal lr: the default 5-epoch warmup would pin
    # a 2-epoch run at warmup_lr=1e-6 and nothing would learn (scaled_lr maps
    # 0.16 at batch 16 to an effective 5e-3)
    main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "8",
          "--epochs", "2", "--batch-size", "16", "--input-size", "32",
          "--steps-per-epoch", "6", "--simple-aug", "--no-model-ema",
          "--lr", "0.16", "--warmup-epochs", "0",
          "--output-dir", str(pre), "--export-teacher", str(teacher)])

    ft_args = ["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes", "4",
               "--epochs", "1", "--batch-size", "16", "--input-size", "48",
               "--steps-per-epoch", "4", "--simple-aug", "--no-model-ema",
               "--lr", "0.16", "--warmup-epochs", "0"]
    # (BN stats keep adapting here — at this toy lr/scale frozen BN with
    # resolution-mismatched stats diverges; --set-bn-eval is exercised below)
    warm = main(ft_args + ["--finetune", str(teacher),
                           "--output-dir", str(tmp_path / "warm")])
    scratch = main(ft_args + ["--output-dir", str(tmp_path / "scratch")])
    assert warm["max_acc"] >= scratch["max_acc"]
    assert warm["max_acc"] > 30.0  # well above the 25% chance floor

    # the warm-started state actually carries the pretrained backbone
    import orbax.checkpoint as ocp

    tvars = ocp.StandardCheckpointer().restore(teacher.resolve())
    stem = jax.device_get(warm["state"].params)["stem"]["conv1"]["conv"]["kernel"]
    # finetune trained it for 3 tiny steps: close to, but not at, the warm start
    pre_stem = np.asarray(tvars["params"]["stem"]["conv1"]["conv"]["kernel"])
    assert np.max(np.abs(np.asarray(stem) - pre_stem)) < 0.05
    head = jax.device_get(warm["state"].params)["head"]["head"]["linear"]["kernel"]
    assert head.shape[-1] == 4  # mismatched head re-initialized at the new width

    # args.yaml records the warm start for provenance
    import yaml

    rec = yaml.safe_load((tmp_path / "warm" / "args.yaml").read_text())
    assert rec["finetune"] == str(teacher) and rec["set_bn_eval"] is False

    # --set-bn-eval (reference --set_bn_eval, engine.py:28-33): BatchNorm runs
    # on the warm-started RUNNING stats and never updates them during training
    bn = main(["--model", "recnext_m0", "--data-set", "FAKE", "--fake-classes",
               "4", "--epochs", "1", "--batch-size", "8", "--input-size", "32",
               "--steps-per-epoch", "2", "--simple-aug", "--no-model-ema",
               "--finetune", str(teacher), "--set-bn-eval",
               "--output-dir", str(tmp_path / "bneval")])
    got = jax.device_get(bn["state"].batch_stats)["stem"]["conv1"]["norm"]
    want = tvars["batch_stats"]["stem"]["conv1"]["norm"]
    np.testing.assert_array_equal(np.asarray(got["mean"]), np.asarray(want["mean"]))
    np.testing.assert_array_equal(np.asarray(got["var"]), np.asarray(want["var"]))
    rec = yaml.safe_load((tmp_path / "bneval" / "args.yaml").read_text())
    assert rec["set_bn_eval"] is True


def test_finetune_cli_flowers_layout(tmp_path):
    """Transfer-dataset CLI smoke: the FLOWERS folder layout (train/ + test/,
    102 classes, train repeated ×100 — reference data/datasets.py:46-56) drives
    end-to-end through --data-set FLOWERS."""
    from PIL import Image

    from recnext_tpu.data.datasets import build_dataset
    from recnext_tpu.train.main import main

    rng = np.random.default_rng(0)
    for split, n_per in (("train", 1), ("test", 1)):
        for cls in range(3):
            d = tmp_path / "flowers" / split / f"class_{cls}"
            d.mkdir(parents=True)
            for i in range(n_per):
                Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
                    d / f"{i}.jpg")

    train_ds, n_cls = build_dataset(True, "FLOWERS", str(tmp_path / "flowers"))
    assert n_cls == 102 and len(train_ds) == 300  # ×100 repeat of 3 images

    res = main(["--model", "recnext_m0", "--data-set", "FLOWERS",
                "--data-path", str(tmp_path / "flowers"),
                "--epochs", "1", "--batch-size", "8", "--input-size", "32",
                "--steps-per-epoch", "2", "--simple-aug", "--no-model-ema",
                "--output-dir", str(tmp_path / "run")])
    assert "max_acc" in res
    log = json.loads((tmp_path / "run" / "log.txt").read_text().splitlines()[-1])
    assert np.isfinite(log["train_loss"])
