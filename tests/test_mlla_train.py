"""MLLA graft-family training path: the reference trains these with its own
Swin-style harness (/root/reference/mlla/cfgs/*.yaml + the merged configs in
mlla/logs/*/01_baseline.txt) — here the same jitted train step serves them, plus
the recipe's two non-RecNeXt ingredients: global-norm gradient clipping
(TRAIN.CLIP_GRAD 5.0) and MESA EMA-self-distillation (AUG.MESA 1.0)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_mlla(variant="recconv"):
    from recnext_tpu.models.mlla import create_mlla

    return create_mlla(f"mlla_nano_{variant}", num_classes=4, embed_dim=8,
                       depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1))


def _setup(mesa, mesa_start_step):
    from recnext_tpu.train.optim import make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_train_step

    model = _tiny_mlla()
    x0 = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(1e-3, clip_mode="norm", agc_clip=5.0)
    state = TrainState.create(variables, tx, ema=True)
    step = make_train_step(model, tx, num_classes=4, mixup=False, smoothing=0.0,
                           mesa=mesa, mesa_start_step=mesa_start_step)
    return state, jax.jit(step)


def test_mesa_gates_on_start_step():
    """Before mesa_start_step the MESA term has weight 0 (loss identical to a
    mesa=0 step); after it, the EMA-teacher soft-CE strictly adds."""
    batch = {"image": jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)),
        "label": jnp.asarray([1, 3], jnp.int32)}
    rng = jax.random.PRNGKey(42)

    state_m, step_m = _setup(mesa=0.7, mesa_start_step=1)
    state_p, step_p = _setup(mesa=0.0, mesa_start_step=0)

    _, m0 = step_m(state_m, batch, rng)
    _, p0 = step_p(state_p, batch, rng)
    np.testing.assert_allclose(float(m0["loss"]), float(p0["loss"]), rtol=1e-6)

    # same params, step bumped past the gate: rng folds identically for both
    # step fns, so the ONLY difference is the MESA term — softCE vs the EMA
    # (== init) weights' softmax, which is strictly positive
    bump = lambda s: s.replace(step=s.step + 1)
    _, m1 = step_m(bump(state_m), batch, rng)
    _, p1 = step_p(bump(state_p), batch, rng)
    assert float(m1["loss"]) > float(p1["loss"]) + 1e-4
    assert np.isfinite(float(m1["loss"]))


def test_mesa_rejects_incompatible_modes():
    from recnext_tpu.train.optim import make_optimizer
    from recnext_tpu.train.step import make_train_step

    model = _tiny_mlla()
    tx = make_optimizer(1e-3)
    with pytest.raises(ValueError, match="MESA"):
        make_train_step(model, tx, distillation="hard", mesa=1.0)
    with pytest.raises(ValueError, match="MESA"):
        make_train_step(model, tx, jsd_splits=2, mesa=1.0)


def test_clip_mode_norm_differs_from_agc():
    """Adam normalizes away any single-step positive rescale of the gradient,
    so the modes are distinguished over TWO steps (the first step's clip factor
    sets the m/v mixing seen by the second)."""
    from recnext_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((4, 4))}
    g1 = {"w": jnp.full((4, 4), 100.0)}   # clipped very differently by the modes
    g2 = {"w": jnp.full((4, 4), 1e-3)}

    def second_update(clip_mode):
        tx = make_optimizer(1e-3, agc_clip=0.02, clip_mode=clip_mode)
        st = tx.init(params)
        _, st = tx.update(g1, st, params)
        u2, _ = tx.update(g2, st, params)
        return np.asarray(u2["w"])

    assert not np.allclose(second_update("norm"), second_update("agc"))
    with pytest.raises(ValueError, match="clip_mode"):
        make_optimizer(1e-3, clip_mode="bogus")


def test_train_main_cli_mlla_smoke(tmp_path):
    """The MLLA recipe end-to-end through the CLI: norm clipping + active MESA
    (start ratio 0) + the unfused eval path (no BN-fusion for LayerNorm nets)."""
    from recnext_tpu.train.main import main

    res = main(["--model", "mlla_nano_recattn_simple", "--data-set", "FAKE",
                "--fake-classes", "8", "--epochs", "1", "--batch-size", "8",
                "--input-size", "64", "--steps-per-epoch", "2", "--simple-aug",
                "--mesa", "1.0", "--mesa-start-ratio", "0.0",
                "--clip-mode", "norm", "--clip-grad", "5.0",
                "--output-dir", str(tmp_path)])
    assert "max_acc" in res
    rec = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    assert {"test_acc1", "ema_test_acc1"} <= set(rec)


def test_train_main_cli_mlla_guards(tmp_path):
    from recnext_tpu.train.main import main

    base = ["--model", "mlla_nano_recconv", "--data-set", "FAKE",
            "--fake-classes", "4", "--epochs", "1", "--batch-size", "4",
            "--input-size", "64", "--steps-per-epoch", "1", "--simple-aug",
            "--output-dir", str(tmp_path)]
    with pytest.raises(SystemExit, match="distillation head"):
        main(base + ["--distillation-type", "hard", "--teacher-model",
                     "recnext_m0"])
    with pytest.raises(SystemExit, match="EMA"):
        main(base + ["--mesa", "1.0", "--no-model-ema"])


def test_validate_cli_mlla(tmp_path):
    from recnext_tpu.validate import main as validate_main

    res = validate_main([
        "--model", "mlla_nano_recconv", "--data-set", "FAKE",
        "--model-kwargs", "embed_dim=8", "--input-size", "64",
        "--batch-size", "8", "--max-batches", "1",
    ])
    assert res["count"] == 8
    with pytest.raises(SystemExit, match="fused"):
        validate_main(["--model", "mlla_nano_recconv", "--fused",
                       "--data-set", "FAKE", "--input-size", "64"])


def test_mlla_recipe_presets_parse():
    """configs/mlla_*_300e.yaml map the reference's merged Swin-harness config
    (mlla/logs/*/01_baseline.txt) onto trainer args."""
    from recnext_tpu.train.main import parse_args

    for size in ("nano", "mini"):
        args = parse_args(["--config", f"configs/mlla_{size}_300e.yaml"])
        assert args.model == f"mlla_{size}_recattn_simple"
        assert args.input_size == 256 and args.epochs == 300
        assert args.clip_mode == "norm" and args.clip_grad == 5.0
        assert args.weight_decay == 0.05 and args.warmup_epochs == 20
        assert args.mesa == 1.0 and args.no_repeated_aug
