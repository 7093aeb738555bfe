"""CLI-tooling tests: attention profile harness, validate CLI, model cards,
YAML config parsing, attention feature maps."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.benchmark.profile_attn import main as profile_main, similarity
from recnext_tpu.ops.attention import (
    feature_map,
    linear_attention_kv_first,
    softmax_attention,
)


def test_profile_attn_equivalence_and_similarity(capsys):
    results = profile_main(["--resolution", "8", "--dim", "64", "--heads", "2",
                            "--batch", "2"])
    # kv-first and qk-first are mathematically identical (reference asserts 1e-4)
    for kind in ("elu", "softplus", "relu"):
        assert results[f"kv_vs_qk[{kind}]"]["allclose_1e-3"], kind
    # linear attention approximates SDPA directionally (reference reports ~0.99 cosine
    # for trained models; random weights are looser)
    assert results["linear[elu]_vs_sdpa"]["cosine"] > 0.5


def test_feature_maps_positive():
    x = jnp.linspace(-5, 5, 101)
    for kind in ("elu", "softplus", "relu"):
        y = np.asarray(feature_map(x, kind))
        assert (y >= 0).all(), kind
    with pytest.raises(ValueError):
        feature_map(x, "nope")


def test_validate_cli_fake_data(tmp_path):
    from recnext_tpu.validate import main as validate_main

    res = validate_main([
        "--model", "recnext_m0", "--data-set", "FAKE", "--input-size", "64",
        "--batch-size", "16", "--max-batches", "2",
        "--results-file", str(tmp_path / "results.csv"),
    ])
    assert res["count"] == 32
    assert (tmp_path / "results.csv").exists()


def test_validate_orbax_checkpoint_path(tmp_path):
    """validate.py --checkpoint <orbax step dir> restores a saved TrainState."""
    import jax
    import orbax.checkpoint as ocp

    from recnext_tpu.models.registry import create_model
    from recnext_tpu.train.optim import make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.validate import main as validate_main

    model = create_model("recnext_m0", num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = TrainState.create(variables, make_optimizer(1e-3))
    path = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.resolve(), jax.device_get(state))
    ckptr.wait_until_finished()  # StandardCheckpointer saves asynchronously

    res = validate_main([
        "--model", "recnext_m0", "--checkpoint", str(path), "--data-set", "FAKE",
        "--input-size", "64", "--batch-size", "8", "--max-batches", "1",
    ])
    assert res["count"] == 8
    # EMA variant restores too
    res = validate_main([
        "--model", "recnext_m0", "--checkpoint", str(path), "--ema",
        "--data-set", "FAKE", "--input-size", "64", "--batch-size", "8",
        "--max-batches", "1",
    ])
    assert res["ema"] is True


def test_modelcard(tmp_path):
    from recnext_tpu.benchmark.modelcard import make_card

    card = make_card("recnext_m0", throughput=3700.0)
    assert "recnext_m0" in card and "2.5" in card and "3700" in card


def test_yaml_config_two_stage(tmp_path):
    import yaml

    from recnext_tpu.train.main import parse_args

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"model": "recnext_m2", "batch_size": 64,
                                   "epochs": 7}))
    args = parse_args(["--config", str(cfg), "--epochs", "9"])
    assert args.model == "recnext_m2"
    assert args.batch_size == 64
    assert args.epochs == 9  # CLI overrides YAML

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({"not_a_flag": 1}))
    with pytest.raises(SystemExit):
        parse_args(["--config", str(bad)])


def test_kernel_option_in_linear_attention():
    import jax

    from recnext_tpu.models.mixers import LinearAttention

    x = jnp.ones((1, 8, 8, 16))
    for kind in ("elu", "softplus", "relu"):
        m = LinearAttention(num_heads=2, kernel=kind)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_validate_cli_packed_matches_plain(tmp_path):
    """--packed (lane-packed executor) must produce the same top1/top5 as the
    plain fused apply — including the ragged final batch (retrace repack)."""
    from recnext_tpu.validate import main as validate_main

    common = ["--model", "recnext_m0", "--data-set", "FAKE", "--input-size", "64",
              "--batch-size", "6", "--max-batches", "3", "--fused"]
    plain = validate_main(common)
    packed = validate_main(common + ["--packed"])
    assert packed["packed"] and not plain["packed"]
    assert packed["top1"] == plain["top1"]
    assert packed["top5"] == plain["top5"]
    assert packed["count"] == plain["count"]


def test_compile_cache_populates(tmp_path):
    """enable_compile_cache stores compiled executables for warm restarts."""
    import jax
    import jax.numpy as jnp

    from recnext_tpu.utils.cache import enable_compile_cache

    # the global cache config must not leak into later tests in this process
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    saved = {k: getattr(jax.config, k) for k in keys}
    try:
        assert enable_compile_cache(None) is None  # no-op without a path
        d = tmp_path / "xla_cache"
        assert enable_compile_cache(str(d)) == str(d)
        jax.jit(lambda x: x * 2 + 1)(jnp.ones((64, 64)))
        assert any(d.iterdir()), "cache dir stayed empty"
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)
