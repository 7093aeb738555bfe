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

    # bench_results.json row -> measured throughput/ratio/latency table rows
    card = make_card("recnext_m0", measured={
        "model": "recnext_m0", "images_per_sec": 14775.1,
        "vs_baseline": 19.7, "batch1_device_ms": 0.31})
    assert "14775 img/s" in card
    assert "19.7x" in card
    assert "0.31 ms" in card


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
        # the actual cache lives under a per-machine-microarch subdir so a
        # foreign host's XLA:CPU AOT code is never replayed (SIGILL risk,
        # MULTICHIP_r04 tail; utils/cache.py:machine_key)
        from recnext_tpu.utils.cache import machine_key

        assert enable_compile_cache(str(d)) == str(d / machine_key())
        jax.jit(lambda x: x * 2 + 1)(jnp.ones((64, 64)))
        assert any((d / machine_key()).iterdir()), "cache dir stayed empty"
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


def _tiny_val_folder(root, nb_classes=2, per_class=3, size=24):
    """root/val/class_i/img_j.png with deterministic pixels; returns file basenames
    in ImageFolder iteration order."""
    from PIL import Image

    rng = np.random.default_rng(0)
    names = []
    for c in range(nb_classes):
        d = root / "val" / f"class_{c}"
        d.mkdir(parents=True)
        for j in range(per_class):
            name = f"img_{c}_{j}.png"
            Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)).save(
                d / name)
            names.append(name)
    return names


def test_validate_real_labels(tmp_path):
    """Real-labels mode: accuracy comes from the reassessed sets, not the folder
    labels — all-classes sets score 100, impossible sets score 0, and files with
    empty sets are skipped (timm RealLabelsImagenet semantics,
    /root/reference/moganet_valid.py:215-216,286-288)."""
    from recnext_tpu.validate import main as validate_main

    names = _tiny_val_folder(tmp_path)
    common = ["--model", "recnext_m0", "--data-set", "FOLDER", "--data-path",
              str(tmp_path), "--input-size", "32", "--batch-size", "4"]

    # every file admits every class -> 100/100, regardless of predictions
    allow_all = {n: [0, 1] for n in names}
    (tmp_path / "real_all.json").write_text(json.dumps(allow_all))
    res = validate_main(common + ["--real-labels", str(tmp_path / "real_all.json")])
    assert res["real_labels"] is True
    assert res["top1"] == 100.0 and res["top5"] == 100.0

    # impossible labels -> 0; empty sets are skipped, not counted wrong
    half = {n: ([999] if i < 3 else []) for i, n in enumerate(names)}
    (tmp_path / "real_none.json").write_text(json.dumps(half))
    res = validate_main(common + ["--real-labels", str(tmp_path / "real_none.json")])
    assert res["top1"] == 0.0 and res["top5"] == 0.0


def test_real_labels_list_format(tmp_path):
    """The original real.json list format keys by ImageNet val-order filenames."""
    from recnext_tpu.validate import RealLabels

    fnames = [f"ILSVRC2012_val_{i + 1:08d}.JPEG" for i in range(3)]
    path = tmp_path / "real.json"
    path.write_text(json.dumps([[5], [], [1, 7]]))
    rl = RealLabels(fnames, str(path))
    logits = np.zeros((3, 10), np.float32)
    logits[0, 5] = 1.0   # top-1 hit
    logits[1, 0] = 1.0   # empty set: skipped
    logits[2, 3] = 1.0   # miss at top-1 ...
    logits[2, 7] = 0.5   # ... but 7 is in top-5
    rl.add_results(logits)
    assert rl.accuracy(1) == 50.0
    assert rl.accuracy(5) == 100.0


def test_real_labels_col_map(tmp_path):
    """--valid-labels + --real-labels: argmax indices live in the sliced-column
    space and must be mapped back to original class ids before the real.json
    lookup (real.json is always original-space)."""
    from recnext_tpu.validate import RealLabels

    path = tmp_path / "real.json"
    path.write_text(json.dumps({"a.JPEG": [600]}))
    valid_cols = np.array([500, 600, 700])
    logits = np.zeros((1, 3), np.float32)
    logits[0, 1] = 1.0  # subset index 1 == original class 600

    rl = RealLabels(["a.JPEG"], str(path), topk=(1,))
    rl.add_results(logits, col_map=valid_cols)
    assert rl.accuracy(1) == 100.0

    # without the map the raw subset index (1) never matches class 600
    rl2 = RealLabels(["a.JPEG"], str(path), topk=(1,))
    rl2.add_results(logits)
    assert rl2.accuracy(1) == 0.0


def test_validate_valid_labels(tmp_path):
    """--valid-labels with the identity subset must reproduce the unfiltered
    result (plumbing check; semantics are a column-subset before scoring)."""
    from recnext_tpu.validate import main as validate_main

    _tiny_val_folder(tmp_path)
    (tmp_path / "valid.txt").write_text("0\n1\n")
    common = ["--model", "recnext_m0", "--data-set", "FOLDER", "--data-path",
              str(tmp_path), "--input-size", "32", "--batch-size", "4"]
    plain = validate_main(common)
    filt = validate_main(common + ["--valid-labels", str(tmp_path / "valid.txt")])
    assert filt["top1"] == plain["top1"] and filt["top5"] == plain["top5"]


def test_validate_test_pool(tmp_path):
    """--test-pool activates above the native 224 resolution (crop-pct forced to
    1.0) and stays inactive at or below it (timm apply_test_time_pool gate)."""
    from recnext_tpu.validate import main as validate_main

    common = ["--model", "recnext_m0", "--data-set", "FAKE", "--batch-size", "2",
              "--max-batches", "1", "--fused", "--test-pool"]
    res = validate_main(common + ["--input-size", "256"])
    assert res["test_pool"] is True
    assert res["crop_pct"] == 1.0
    assert res["count"] == 2
    res = validate_main(common + ["--input-size", "64"])
    assert res["test_pool"] is False


def test_flops_attn_crossover():
    """LA kv-first vs qk-first FLOP crossover at seq_len == head_dim and numeric
    equivalence (the /root/reference/mlla/flops_attn.py:55-84 assertions) via XLA
    cost analysis on two combos from either side of the crossover."""
    from recnext_tpu.benchmark.flops_attn import analyze

    rec = analyze(dim=16, num_heads=2, resolution=8)  # n=64 > head_dim=8
    assert rec["allclose_1e-4"] and rec["kv_first_cheaper"]
    rec = analyze(dim=256, num_heads=2, resolution=4)  # n=16 < head_dim=128
    assert rec["allclose_1e-4"] and not rec["kv_first_cheaper"]


def test_analyze_logs(tmp_path, capsys):
    """analyze_logs tolerates non-JSON lines and computes best/timing over both
    epoch-keyed and iter-keyed logs (analyze_logs.py counterpart checks)."""
    from recnext_tpu.benchmark.analyze_logs import load_records, main as logs_main

    log = tmp_path / "log.txt"
    log.write_text(
        "WARNING: some jax noise\n"
        '{"epoch": 0, "test_acc1": 10.0, "epoch_time_s": 5.0}\n'
        "epoch 0 step 8: loss 4.2\n"
        '{"epoch": 1, "test_acc1": 30.0, "epoch_time_s": 3.0}\n'
    )
    assert len(load_records(str(log))) == 2
    logs_main(["best", str(log), "--keys", "test_acc1"])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["best"] == 30.0 and rec["at"] == 1
    logs_main(["cal_train_time", str(log)])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["time_mean_s"] == 4.0 and rec["records"] == 2

    itlog = tmp_path / "it.log"
    itlog.write_text(
        '{"iter": 100, "mIoU": 11.0, "elapsed_s": 10.0}\n'
        '{"iter": 200, "mIoU": 12.5, "elapsed_s": 16.0}\n'
    )
    logs_main(["best", str(itlog), "--keys", "mIoU"])
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["best"] == 12.5 and rec["at"] == 200
    logs_main(["plot_curve", str(itlog), "--keys", "mIoU",
               "--out", str(tmp_path / "c.png")])
    capsys.readouterr()
    assert (tmp_path / "c.png").stat().st_size > 0


def test_device_latency_scan_chained(monkeypatch):
    """bench.device_latency_ms: the scan-chained batch-1 latency measurement
    compiles, serializes iterations through a data dependency, and returns a
    positive per-inference time (tiny config; the real number is measured on
    the TPU — PERF.md 'batch-1 latency')."""
    from pathlib import Path

    monkeypatch.syspath_prepend(str(Path(__file__).resolve().parents[1]))
    import bench as bench_mod

    ms = bench_mod.device_latency_ms(
        "recnext_m0", dtype=jnp.float32, iters=3, image_size=32,
        embed_dim=(8, 16, 32, 64), depth=(1, 0, 1, 0),
        mlp_ratio=(2.0, 2.0, 2.0, 2.0), num_classes=4)
    assert ms > 0.0


def test_require_devices_success_path():
    """Watchdog returns devices and leaves no pending exit when init is healthy
    (the timeout path is exercised operationally: rc=17 + JSON error line when
    the axon tunnel is down — see utils/watchdog.py)."""
    from recnext_tpu.utils.watchdog import require_devices

    devices = require_devices(timeout_s=60.0)
    assert len(devices) >= 1
    # disabled mode passes straight through
    assert len(require_devices(timeout_s=0)) >= 1


def test_bench_all_resume_and_error_capture(tmp_path, monkeypatch):
    """bench_all: rows flush after every model, --resume skips completed models
    (and retries errored ones), per-model failures become error rows instead of
    killing the sweep — the tunnel-outage restartability contract."""
    from pathlib import Path

    monkeypatch.syspath_prepend(str(Path(__file__).resolve().parents[1]))
    import bench as bench_mod
    from recnext_tpu.benchmark import bench_all

    calls = []

    def fake_throughput(name, batch, **kw):
        calls.append(name)
        if name == "recnext_m1":
            raise RuntimeError("simulated tunnel drop")
        return 1000.0, batch

    monkeypatch.setattr(bench_mod, "throughput", fake_throughput)
    monkeypatch.setattr(bench_mod, "device_latency_ms", lambda name, **kw: 1.5)

    out = tmp_path / "res.json"
    rows = bench_all.main(["--models", "recnext_m0", "recnext_m1", "--latency",
                           "--out", str(out)])
    assert [r["model"] for r in rows] == ["recnext_m0", "recnext_m1"]
    assert rows[0]["batch1_device_ms"] == 1.5
    assert rows[0]["vs_baseline"] == round(1000.0 / 750, 3)
    assert "simulated tunnel drop" in rows[1]["error"]
    assert json.loads(out.read_text()) == rows  # flushed to disk

    # resume: m0 kept (not re-run), errored m1 retried and now succeeds
    def ok_throughput(name, batch, **kw):
        calls.append(name)
        return 2000.0, batch

    monkeypatch.setattr(bench_mod, "throughput", ok_throughput)
    calls.clear()
    rows2 = bench_all.main(["--models", "recnext_m0", "recnext_m1", "--resume",
                            "--out", str(out)])
    assert calls == ["recnext_m1"]
    assert {r["model"] for r in rows2} == {"recnext_m0", "recnext_m1"}
    assert all("error" not in r for r in rows2)

    # a subset --models retry must NOT drop other models' measured rows
    calls.clear()
    rows3 = bench_all.main(["--models", "recnext_m0", "--resume",
                            "--out", str(out)])
    assert calls == []  # m0 already measured, nothing re-run
    assert {r["model"] for r in rows3} == {"recnext_m0", "recnext_m1"}
    assert json.loads(out.read_text()) == rows3


def test_merge_results_best_of_batch(tmp_path):
    """merge_results: higher-throughput row wins per model, batch-1 latency is
    carried across inputs, error rows are dropped, order follows first file."""
    from recnext_tpu.benchmark.merge_results import main as merge_main, markdown_table

    a = [{"model": "recnext_m0", "images_per_sec": 14000.0, "batch": 256,
          "rtx3090_baseline": 750, "vs_baseline": 18.7, "batch1_device_ms": 0.21},
         {"model": "recnext_m1", "images_per_sec": 9400.0, "batch": 256,
          "rtx3090_baseline": 384, "vs_baseline": 24.5, "batch1_device_ms": 0.3}]
    b = [{"model": "recnext_m0", "images_per_sec": 14800.0, "batch": 512,
          "rtx3090_baseline": 750, "vs_baseline": 19.7},
         {"model": "recnext_m1", "error": "RuntimeError: boom"}]
    fa, fb = tmp_path / "a.json", tmp_path / "b.json"
    fa.write_text(json.dumps(a)); fb.write_text(json.dumps(b))
    out = tmp_path / "merged.json"
    rows = merge_main([str(fa), str(fb), "--out", str(out)])

    assert [r["model"] for r in rows] == ["recnext_m0", "recnext_m1"]
    m0, m1 = rows
    assert m0["images_per_sec"] == 14800.0 and m0["batch"] == 512
    assert m0["batch1_device_ms"] == 0.21  # carried from the 256 pass
    assert m1["images_per_sec"] == 9400.0  # error row dropped, 256 row kept
    table = markdown_table(rows)
    assert "| recnext_m0 | 14800 | 750 | 19.7x | 0.21 |" in table


def test_model_kwargs_overrides(tmp_path):
    """--model-kwargs: parse/coerce k=v ablation overrides, reject malformed
    entries and unknown config keys loudly."""
    import pytest as _pytest

    from recnext_tpu.models.registry import create_model, parse_kv_overrides

    kw = parse_kv_overrides("recconv_kernel_size=3,recconv_mode=nearest,"
                            "drop_rate=0.1,share_channel=true")
    assert kw == {"recconv_kernel_size": 3, "recconv_mode": "nearest",
                  "drop_rate": 0.1, "share_channel": True}
    assert parse_kv_overrides("") == {}
    with _pytest.raises(ValueError):
        parse_kv_overrides("oops")
    with _pytest.raises(TypeError):
        create_model("recnext_m0", **parse_kv_overrides("not_a_field=1"))

    m = create_model("recnext_m0", **parse_kv_overrides("recconv_kernel_size=3"))
    assert m.cfg.recconv_kernel_size == 3


def test_roofline_mac_split_cross_checks_cost_analysis():
    """roofline.py's jaxpr MAC classification (MXU dense vs VPU depthwise) must
    sum to the same total as XLA's own cost analysis (benchmark/flops.py,
    fvcore-convention MACs = flops/2) within the tolerance XLA's fusion-level
    accounting introduces — and the m family must be VPU-bound (PERF.md: the
    RecConv depthwise chain is the critical engine, MXU is nearly idle)."""
    from recnext_tpu.benchmark.flops import model_flops
    from recnext_tpu.benchmark.roofline import model_roofline

    row = model_roofline("recnext_m0", batch=1)
    jaxpr_macs = row["mxu_gmacs_per_img"] + row["vpu_gmacs_per_img"]
    _, macs = model_flops("recnext_m0", 224, fused=True)
    assert abs(jaxpr_macs - macs / 1e9) / (macs / 1e9) < 0.20
    assert row["bound_engine"] == "vpu"
    assert row["compute_bound_ms_per_img"] == row["vpu_bound_ms"] > 0


def test_roofline_utilization_from_results(tmp_path, capsys):
    import json

    from recnext_tpu.benchmark import roofline

    res = tmp_path / "r.json"
    res.write_text(json.dumps(
        [{"model": "recnext_m0", "images_per_sec": 10000.0}]))
    rows = roofline.main(["--results", str(res),
                          "--out", str(tmp_path / "out.json")])
    assert rows[0]["measured_ms_per_img"] == 0.1
    want = round(100 * rows[0]["compute_bound_ms_per_img"] / 0.1, 1)
    assert rows[0]["roofline_utilization_pct"] == want
    assert json.loads((tmp_path / "out.json").read_text())[0]["model"] == "recnext_m0"


def test_bench_mlla_native_size_default(monkeypatch, capsys):
    """bench_mlla defaults to the config's native 256 input (224 is invalid for
    the recattn grafts — odd 7x7 stage vs the x2 attention upsample) and emits
    one JSON row per model."""
    import json

    from recnext_tpu.benchmark import bench_mlla

    seen = []

    def fake_throughput(name, batch, *, timed_s, image_size, attn_impl):
        seen.append((name, batch, image_size, attn_impl))
        return 1234.5

    monkeypatch.setattr(bench_mlla, "throughput", fake_throughput)
    monkeypatch.setattr("recnext_tpu.utils.watchdog.require_devices",
                        lambda **k: None)
    rows = bench_mlla.main(["--models", "mlla_nano_recconv", "--batch", "8"])
    assert seen == [("mlla_nano_recconv", 8, 0, "headbatch")]
    assert rows == [{"model": "mlla_nano_recconv", "batch": 8,
                     "image_size": 256, "attn_impl": "headbatch",
                     "images_per_sec": 1234.5}]
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["model"] == "mlla_nano_recconv"

    # --train dispatches to the train-step path and stamps the mode (incl. the
    # MESA-active flavor of the MLLA recipe)
    train_seen = []

    def fake_train(name, batch, *, timed_s, image_size, mesa, attn_impl):
        train_seen.append((name, mesa))
        return 99.0

    monkeypatch.setattr(bench_mlla, "train_throughput", fake_train)
    rows = bench_mlla.main(["--models", "mlla_nano_recconv", "--batch", "8",
                            "--train", "--mesa", "1.0"])
    assert train_seen == [("mlla_nano_recconv", 1.0)]
    assert rows[0]["mode"] == "train+mesa1.0"


def test_mlla_model_card(monkeypatch):
    """MLLA cards carry variant/depths and the measured throughput/train rows
    from bench_mlla_r4.json-style results."""
    from recnext_tpu.benchmark import modelcard

    monkeypatch.setattr("recnext_tpu.benchmark.flops.mlla_flops",
                        lambda name: (3_990_000, 0.942e9))
    card = modelcard.make_mlla_card(
        "mlla_mini_recattn",
        measured={"images_per_sec": 3557.3, "train_images_per_sec": 2335.2})
    assert "| variant | recattn |" in card
    assert "| depths | (2, 4, 8, 4) |" in card
    assert "3557 img/s" in card and "2335 img/s" in card
    assert "configs/mlla_mini_300e.yaml" in card
    card = modelcard.make_mlla_card("mlla_nano_recconv")
    assert "TPU v5e throughput" not in card  # no unmeasured claims


def test_mlla_native_size_resolution():
    """throughput() resolves image_size=0 to MLLAConfig.img_size (256)."""
    from recnext_tpu.models.mlla import MLLA_CONFIGS

    assert all(cfg.img_size == 256 for cfg in MLLA_CONFIGS.values())
