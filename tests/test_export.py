"""Export/publish round-trips and FLOP counting."""

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.benchmark.flops import count_params, model_flops
from recnext_tpu.export import export_stablehlo, load_published, publish_fused
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from recnext_tpu.models.registry import MODEL_CONFIGS, create_model


def test_publish_roundtrip(tmp_path):
    name = "recnext_m0"
    model = create_model(name)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    f = publish_fused(name, variables, str(tmp_path))
    assert f.exists() and (tmp_path / f"{name}_meta.json").exists()

    restored = load_published(name, str(tmp_path))
    fused_model = create_model(name, fused=True)
    y1 = fused_model.apply(restored, x, training=False)

    y0 = model.apply(variables, x, training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4, rtol=1e-4)


def test_stablehlo_export_executes(tmp_path):
    from jax import export as jexport

    cfg = RecNextConfig(name="tiny", family="m", embed_dim=(8, 16, 32, 64),
                        depth=(1, 0, 1, 0), mlp_ratio=(2, 2, 2, 2), num_classes=4)
    model = RecNext(cfg=cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(xx):
        return model.apply(variables, xx, training=False)

    exported = jexport.export(jax.jit(fwd))(jax.ShapeDtypeStruct(x.shape, x.dtype))
    blob = exported.serialize()
    assert len(blob) > 1000
    # deserialize and run
    back = jexport.deserialize(blob)
    y = back.call(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fwd(x)), atol=1e-5)


def test_stablehlo_export_mlla_executes(tmp_path):
    """export_stablehlo serves the MLLA graft family too (no fused form; native
    256 input auto-selected by default, tiny override here)."""
    from jax import export as jexport

    from recnext_tpu.export import export_stablehlo
    from recnext_tpu.models.mlla import create_mlla

    model = create_mlla("mlla_nano_recconv", num_classes=4, embed_dim=8,
                        depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # monkey-free path: hand the tiny variables straight to the exporter with an
    # explicit input size (the public CLI uses the full config at 256)
    import recnext_tpu.export as ex
    import recnext_tpu.models.mlla as mlla_mod

    orig = mlla_mod.create_mlla
    mlla_mod.create_mlla = lambda name, **kw: model
    try:
        blob = export_stablehlo("mlla_nano_recconv", variables, batch=1,
                                input_size=64, dtype=jnp.float32,
                                out_path=str(tmp_path / "m.stablehlo"))
    finally:
        mlla_mod.create_mlla = orig
    assert (tmp_path / "m.stablehlo").exists() and len(blob) > 1000
    back = jexport.deserialize(blob)
    want = model.apply(variables, x, training=False)
    np.testing.assert_allclose(np.asarray(back.call(x)), np.asarray(want),
                               atol=1e-5)


def test_param_counts_match_reference_table():
    """Fused param counts vs the published table (upload.py:12-34 / BASELINE.md),
    within rounding (reference rounds to 0.1M)."""
    expected = {"recnext_m0": 2.5, "recnext_m1": 5.2, "recnext_a0": 2.8,
                "recnext_t": 12.1}
    from recnext_tpu.fusion import fuse_params

    for name, want in expected.items():
        model = create_model(name)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        n = count_params(fuse_params(variables)["params"])
        assert abs(n / 1e6 - want) < 0.1, f"{name}: {n/1e6:.2f}M vs {want}M"


def test_sha_stamp_publish(tmp_path):
    """publish_model.py role: content-addressed artifact name, digest in meta,
    load_published resolves the stamped file."""
    import hashlib
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from recnext_tpu.export import load_published, publish_fused, sha_stamp
    from recnext_tpu.models.registry import create_model

    model = create_model("recnext_m0", fused=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    f = publish_fused("recnext_m0", variables, str(tmp_path))
    stamped = sha_stamp(f)
    assert not f.exists() and stamped.exists()
    digest = hashlib.sha256(stamped.read_bytes()).hexdigest()
    assert stamped.name == f"recnext_m0_fused-{digest[:8]}.msgpack"
    meta = json.loads((tmp_path / "recnext_m0_meta.json").read_text())
    assert meta["sha256"] == digest and meta["artifact"] == stamped.name
    restored = load_published("recnext_m0", str(tmp_path))
    fused = create_model("recnext_m0", fused=True)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused.apply(restored, x, training=False)),
        np.asarray(fused.apply(restored, x, training=False)))


def test_task_flops_counts():
    """get_flops.py role: seg/det FLOP counting runs and scales with input."""
    from recnext_tpu.benchmark.flops import task_flops

    n_seg, macs_seg = task_flops("seg", "recnext_m0", 64, num_classes=10)
    assert n_seg > 2e6 and macs_seg > 0
    _, macs_big = task_flops("seg", "recnext_m0", 128, num_classes=10)
    assert macs_big > 3 * macs_seg  # ~quadratic in side length
    n_det, macs_det = task_flops("retinanet", "recnext_m0", 64, num_classes=10)
    assert n_det > n_seg / 2 and macs_det > 0
