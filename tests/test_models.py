"""Golden end-to-end parity: Flax RecNext vs the reference PyTorch models.

For each family a small-config torch model is built from the actual reference source
(imported read-only from /root/reference), its random state dict is converted with
recnext_tpu.convert.torch_to_flax, and eval-mode outputs are compared. Also checks the
BN-fusion transform (fused == unfused, mirroring fuse_eval.py's parity role) and the
training-mode distillation tuple output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.convert import torch_to_flax
from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from tests.torch_ref import load_ref_module, to_nchw_tensor, to_nhwc

# Small configs (2 stages deep enough to hit every code path) to keep CPU time sane.
SMALL = {
    "m": RecNextConfig(name="small_m", family="m", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 1), mlp_ratio=(2, 2, 2, 2), num_classes=10),
    "a": RecNextConfig(name="small_a", family="a", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 1), mlp_ratio=(1.875,) * 4, num_classes=10),
    "l": RecNextConfig(name="small_l", family="l", embed_dim=(16, 32, 64, 128),
                       depth=(1, 1, 2, 2), mlp_ratio=(2, 2, 2, 1.5),
                       num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4), num_classes=10),
}


def _torch_model(family, cfg):
    if family == "m":
        mod = load_ref_module("model/recnext.py", "ref_recnext_m")
        return mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth,
                           mlp_ratio=int(cfg.mlp_ratio[0]), num_classes=cfg.num_classes,
                           distillation=cfg.distillation)
    if family == "a":
        mod = load_ref_module("model/recattn.py", "ref_recnext_a")
        return mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth,
                           mlp_ratio=cfg.mlp_ratio[0], num_classes=cfg.num_classes,
                           distillation=cfg.distillation)
    mod = load_ref_module("lsnet/model/recattn.py", "ref_recnext_l")
    return mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth,
                       mlp_ratios=cfg.mlp_ratio, num_heads=cfg.num_heads,
                       split_rates=cfg.split_rates, num_classes=cfg.num_classes,
                       distillation=cfg.distillation)


def _randomize_bn_stats(tm, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_model_parity_eval(family):
    cfg = SMALL[family]
    torch.manual_seed(0)
    tm = _torch_model(family, cfg).eval()
    _randomize_bn_stats(tm)

    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)

    x_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    y_j = np.asarray(fm.apply(variables, jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_fused_parity(family):
    cfg = SMALL[family]
    torch.manual_seed(1)
    tm = _torch_model(family, cfg).eval()
    _randomize_bn_stats(tm, seed=1)
    variables = torch_to_flax(tm.state_dict())

    fm = RecNext(cfg=cfg)
    fm_fused = RecNext(cfg=cfg, fused=True)
    fused_vars = fuse_params(variables)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32))
    y = np.asarray(fm.apply(variables, x))
    y_f = np.asarray(fm_fused.apply(fused_vars, x))
    np.testing.assert_allclose(y_f, y, atol=2e-4, rtol=1e-4)

    # and against the torch model fused in-place (utils.replace_batchnorm equivalent)
    tm.fuse()
    with torch.no_grad():
        y_tf = tm(to_nchw_tensor(np.asarray(x))).numpy()
    np.testing.assert_allclose(y_f, y_tf, atol=2e-4, rtol=1e-4)


def test_share_channel_parity_eval():
    """L share-channel variant vs /root/reference/lsnet/model/recattn_share_channel.py:
    stage-3 share blocks (every 5th) replay the concatenated partial outputs."""
    cfg = RecNextConfig(name="small_lsc", family="l", embed_dim=(16, 32, 64, 128),
                        depth=(1, 1, 2, 5), mlp_ratio=(2, 2, 2, 1.5),
                        num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4),
                        num_classes=10, share_channel=True)
    mod = load_ref_module("lsnet/model/recattn_share_channel.py", "ref_recnext_lsc")
    torch.manual_seed(2)
    tm = mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth, mlp_ratios=cfg.mlp_ratio,
                     split_rates=cfg.split_rates, num_classes=cfg.num_classes).eval()
    _randomize_bn_stats(tm, seed=2)

    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)
    x_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    y_j = np.asarray(fm.apply(variables, jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)

    # fused parity too
    fm_fused = RecNext(cfg=cfg, fused=True)
    y_f = np.asarray(fm_fused.apply(fuse_params(variables),
                                    jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_f, y_t, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_torch_fused_checkpoint_import(family):
    """Import a torch-side-fused state dict (the published *_fused.pt layout) into
    our fused model and match the torch fused outputs."""
    from recnext_tpu.convert import torch_fused_to_flax

    cfg = SMALL[family]
    torch.manual_seed(3)
    tm = _torch_model(family, cfg).eval()
    _randomize_bn_stats(tm, seed=3)
    tm.fuse()  # in-place module surgery -> published fused layout

    variables = torch_fused_to_flax(tm.state_dict(), family=family)
    fm_fused = RecNext(cfg=cfg, fused=True)
    x_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    y_j = np.asarray(fm_fused.apply(variables, jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_full_m0_parity_at_224():
    """North-star parity path (PARITY.md): the FULL recnext_m0 config at 224² —
    the exact model/size the published-checkpoint eval uses (fuse_eval.py:33-55) —
    golden vs the reference source, both unfused and through the published-fused
    import path. Only the real checkpoint artifact is missing (no egress)."""
    from recnext_tpu.convert import torch_fused_to_flax
    from recnext_tpu.models.registry import get_config

    cfg = get_config("recnext_m0", num_classes=1000)
    torch.manual_seed(7)
    tm = _torch_model("m", cfg).eval()
    _randomize_bn_stats(tm, seed=7)

    x_t = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        y_t = tm(x_t).numpy()

    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)
    y_j = np.asarray(jax.jit(
        lambda v, x: fm.apply(v, x, training=False))(variables,
                                                     jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=5e-4, rtol=1e-4)

    tm.fuse()
    fused_vars = torch_fused_to_flax(tm.state_dict(), family="m")
    with torch.no_grad():
        y_tf = tm(x_t).numpy()
    fmf = RecNext(cfg=cfg, fused=True)
    y_jf = np.asarray(jax.jit(
        lambda v, x: fmf.apply(v, x, training=False))(fused_vars,
                                                      jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_jf, y_tf, atol=5e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["recnext_m5", "recnext_a5",
                                  "recnext_b_share_channel"])
def test_full_flagship_parity_at_224(name):
    """±0.1% chain, architecture-scale link for every family's flagship: the FULL
    config at 224² (the published-checkpoint eval setting, fuse_eval.py:33-55)
    golden vs the reference source — unfused, published-fused import, and (m/a)
    the lane-packed executor. Covers the configs the reduced-config tests miss:
    m5's depth-(7,7,35,2), a5's mlp_ratio 1.875 (recattn.py:378-420), b_share's
    share-stage 3 (recattn_share_channel.py:461-480)."""
    from recnext_tpu.convert import torch_fused_to_flax
    from recnext_tpu.models.registry import get_config

    cfg = get_config(name, num_classes=1000)
    torch.manual_seed(11)
    if cfg.share_channel:
        mod = load_ref_module("lsnet/model/recattn_share_channel.py",
                              "ref_recnext_lsc")
        tm = mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth,
                         mlp_ratios=cfg.mlp_ratio, split_rates=cfg.split_rates,
                         num_classes=cfg.num_classes).eval()
    else:
        tm = _torch_model(cfg.family, cfg).eval()
    _randomize_bn_stats(tm, seed=11)

    x_t = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        y_t = tm(x_t).numpy()

    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)
    y_j = np.asarray(jax.jit(
        lambda v, x: fm.apply(v, x, training=False))(variables,
                                                     jnp.asarray(to_nhwc(x_t))))
    # deeper stacks (35-block stage 3) accumulate more fp32 reassociation noise
    # than m0; bound stays far inside the ±0.1%-top1 envelope
    np.testing.assert_allclose(y_j, y_t, atol=2e-3, rtol=1e-4)

    tm.fuse()
    fused_vars = torch_fused_to_flax(tm.state_dict(), family=cfg.family)
    with torch.no_grad():
        y_tf = tm(x_t).numpy()
    fmf = RecNext(cfg=cfg, fused=True)
    y_jf = np.asarray(jax.jit(
        lambda v, x: fmf.apply(v, x, training=False))(fused_vars,
                                                      jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_jf, y_tf, atol=2e-3, rtol=1e-4)

    if cfg.family in ("m", "a"):
        from recnext_tpu.models.packed_infer import packed_apply

        y_p = np.asarray(jax.jit(
            lambda v, x: packed_apply(v, cfg, x))(fused_vars,
                                                  jnp.asarray(to_nhwc(x_t))))
        # packed executor invariant vs the fused flax model (same bound family
        # as tests/test_packed_infer.py, scaled for the deeper stack)
        np.testing.assert_allclose(y_p, y_jf, atol=5e-4, rtol=2e-5)


def test_feature_pyramid_shapes():
    cfg = SMALL["m"]
    fm = RecNext(cfg=cfg)
    x = jnp.ones((1, 64, 64, 3))
    variables = fm.init(jax.random.PRNGKey(0), x)
    feats = fm.apply(variables, x, method=fm.features)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_distillation_tuple_and_bn_stats_update():
    cfg = SMALL["m"]
    cfg = type(cfg)(**{**cfg.__dict__, "distillation": True})
    fm = RecNext(cfg=cfg)
    x = jnp.ones((2, 64, 64, 3))
    variables = fm.init(jax.random.PRNGKey(0), x)
    (y1, y2), updated = fm.apply(
        variables, x, training=True, mutable=["batch_stats"],
        rngs={"droppath": jax.random.PRNGKey(1)})
    assert y1.shape == (2, 10) and y2.shape == (2, 10)
    # batch stats must actually move
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_frozen_stats_mode():
    cfg = SMALL["m"]
    fm = RecNext(cfg=cfg, frozen_stats=True)
    x = jnp.ones((2, 64, 64, 3))
    variables = fm.init(jax.random.PRNGKey(0), x)
    _, updated = fm.apply(variables, x, training=True, mutable=["batch_stats"],
                          rngs={"droppath": jax.random.PRNGKey(1)})
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert all(np.allclose(b, a) for b, a in zip(before, after))


def test_recconv_ablation_config_knobs():
    """recconv_kernel_size / recconv_mode reproduce the reference's ablation
    family (logs/ablation rec_3x3 / *_nearest; RecConv2d params
    model/recnext.py:9,426) through the whole chain: build, fuse parity, and
    the lane-packed executor."""
    import dataclasses

    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.packed_infer import packed_apply

    cfg = dataclasses.replace(SMALL["m"], recconv_kernel_size=3,
                              recconv_mode="nearest")
    fm = RecNext(cfg=cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["stage0_block0"]["token_mixer"]["down_kernel"]
    assert k.shape[:2] == (3, 3)

    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=cfg, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    raw = np.asarray(fm.apply(variables, x, training=False))
    np.testing.assert_allclose(want, raw, atol=2e-5, rtol=2e-5)
    got = np.asarray(packed_apply(fused_vars, cfg, x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_frozen_stats_keeps_stochastic_depth_active():
    """frozen_stats freezes ONLY BatchNorm — DropPath must stay governed by
    `training`, like the reference frozen-BN train() which .eval()s only BN
    modules (detection/recnext.py:266-272)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL["m"], drop_path=0.5)
    fm = RecNext(cfg=cfg, frozen_stats=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)
    outs = [fm.apply(variables, x, training=True, mutable=["batch_stats"],
                     rngs={"droppath": jax.random.PRNGKey(s)})[0]
            for s in (1, 2)]
    y1 = outs[0][0] if isinstance(outs[0], tuple) else outs[0]
    y2 = outs[1][0] if isinstance(outs[1], tuple) else outs[1]
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), \
        "DropPath inert under frozen_stats"


def test_head_drop_rate_is_consumed():
    """cfg.drop_rate applies dropout before the classifier heads in training
    (reference model/recnext.py:260-269 nn.Dropout(drop_rate))."""
    import dataclasses

    cfg = dataclasses.replace(SMALL["m"], drop_rate=0.5)
    fm = RecNext(cfg=cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)
    outs = [fm.apply(variables, x, training=True, mutable=["batch_stats"],
                     rngs={"droppath": jax.random.PRNGKey(9),
                           "dropout": jax.random.PRNGKey(s)})[0]
            for s in (1, 2)]
    y1 = outs[0][0] if isinstance(outs[0], tuple) else outs[0]
    y2 = outs[1][0] if isinstance(outs[1], tuple) else outs[1]
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), \
        "head dropout ignores cfg.drop_rate"
    # eval path is deterministic and drop-free
    e1 = fm.apply(variables, x, training=False)
    e2 = fm.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize("family", ["m", "a"])
def test_torch_fused_import_through_packed_executor(family):
    """The published-fused-checkpoint import feeds the lane-packed executor
    unchanged: torch fused outputs == packed_apply on the converted params
    (closes the checkpoint -> fast-serving loop end to end)."""
    from recnext_tpu.convert import torch_fused_to_flax
    from recnext_tpu.models.packed_infer import packed_apply

    cfg = SMALL[family]
    torch.manual_seed(5)
    tm = _torch_model(family, cfg).eval()
    _randomize_bn_stats(tm, seed=5)
    tm.fuse()
    variables = torch_fused_to_flax(tm.state_dict(), family=family)
    x_t = torch.randn(4, 3, 64, 64)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    y_p = np.asarray(packed_apply(variables, cfg, jnp.asarray(to_nhwc(x_t)),
                                  group=2))
    np.testing.assert_allclose(y_p, y_t, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["m", "a"])
def test_parity_at_384(family):
    """Resolution generality (the reference ablates at 384²,
    /root/reference/README.md:459-479): golden parity vs the reference source
    at 384 input — the stage pyramid runs 96/48/24/12 with RecConv levels
    reaching 6×6/3×3 at stage 3, a different odd/even chain than 224's
    56/28/14/7 — plus the packed executor at the same size."""
    cfg = SMALL[family]
    torch.manual_seed(21)
    tm = _torch_model(family, cfg).eval()
    _randomize_bn_stats(tm, seed=21)
    x_t = torch.randn(1, 3, 384, 384)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)
    y_j = np.asarray(jax.jit(
        lambda v, x: fm.apply(v, x, training=False))(variables,
                                                     jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=5e-4, rtol=1e-4)

    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.packed_infer import packed_apply

    fused_vars = fuse_params(variables)
    fmf = RecNext(cfg=cfg, fused=True)
    y_jf = np.asarray(jax.jit(
        lambda v, x: fmf.apply(v, x, training=False))(fused_vars,
                                                      jnp.asarray(to_nhwc(x_t))))
    y_p = np.asarray(jax.jit(
        lambda v, x: packed_apply(v, cfg, x, group=2))(
            {"params": fused_vars["params"]},
            jnp.asarray(np.repeat(to_nhwc(x_t), 2, axis=0))))
    np.testing.assert_allclose(y_p[0], y_jf[0], atol=5e-4, rtol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["recnext_m1", "recnext_a1"])
def test_full_flagship_parity_at_384(name):
    """FULL m1/a1 configs at 384² golden vs the reference source (the exact
    models/resolution of the README 384 ablation rows, README.md:459-479),
    unfused + fused."""
    from recnext_tpu.convert import torch_fused_to_flax
    from recnext_tpu.models.registry import get_config

    cfg = get_config(name, num_classes=1000)
    torch.manual_seed(13)
    tm = _torch_model(cfg.family, cfg).eval()
    _randomize_bn_stats(tm, seed=13)
    x_t = torch.randn(1, 3, 384, 384)
    with torch.no_grad():
        y_t = tm(x_t).numpy()
    variables = torch_to_flax(tm.state_dict())
    fm = RecNext(cfg=cfg)
    y_j = np.asarray(jax.jit(
        lambda v, x: fm.apply(v, x, training=False))(variables,
                                                     jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_j, y_t, atol=2e-3, rtol=1e-4)

    tm.fuse()
    fused_vars = torch_fused_to_flax(tm.state_dict(), family=cfg.family)
    with torch.no_grad():
        y_tf = tm(x_t).numpy()
    fmf = RecNext(cfg=cfg, fused=True)
    y_jf = np.asarray(jax.jit(
        lambda v, x: fmf.apply(v, x, training=False))(fused_vars,
                                                      jnp.asarray(to_nhwc(x_t))))
    np.testing.assert_allclose(y_jf, y_tf, atol=2e-3, rtol=1e-4)
