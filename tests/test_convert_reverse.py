"""Reverse converter golden tests: flax -> torch state dicts.

The exported dicts must load into the ACTUAL reference models
(/root/reference/model/recnext.py, model/recattn.py, lsnet/model/recattn.py,
lsnet/model/recattn_share_channel.py) with strict=True and reproduce the flax
outputs — i.e. a TPU-trained checkpoint flows back into the torch ecosystem
(fuse_eval.py / publish.py / export tooling) losslessly. flax_to_torch itself
round-trip-verifies against the golden-tested forward converters at runtime;
these tests additionally prove the produced KEY NAMES are the reference's by
doing a strict torch load and an output comparison.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from recnext_tpu.convert import (flax_fused_to_torch, flax_to_torch,
                                 load_torch_checkpoint, save_torch_checkpoint,
                                 torch_fused_to_flax)
from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.recnext import RecNext, RecNextConfig
from tests.test_models import SMALL, _torch_model
from tests.torch_ref import load_ref_module, to_nchw_tensor


def _random_variables(model, seed=0):
    """Init then re-randomize every leaf (vars positive) so BN stats and params
    are all non-trivial — a plain init has mean=0/var=1 which would mask
    stat-mapping bugs."""
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        name = path[-1].key
        arr = rng.normal(size=leaf.shape).astype(np.float32) * 0.1
        if name == "var":
            arr = np.abs(arr) + 0.75
        if name == "scale":
            arr = arr + 1.0
        return jnp.asarray(arr)

    return jax.tree_util.tree_map_with_path(rand, variables)


def _load_strict(tm, state):
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in state.items()}, strict=True)


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_flax_to_torch_strict_load_and_parity(family):
    cfg = SMALL[family]
    fm = RecNext(cfg=cfg)
    # NOT hash(family): Python string hashing is salted per process, which
    # would make any tolerance failure irreproducible across runs
    variables = _random_variables(fm, seed=ord(family))
    state = flax_to_torch(variables)  # verify=True round-trips internally

    tm = _torch_model(family, cfg).eval()
    _load_strict(tm, state)

    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    y_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_t = tm(to_nchw_tensor(x)).numpy()
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


def test_flax_to_torch_share_channel():
    cfg = RecNextConfig(name="small_lsc", family="l", embed_dim=(16, 32, 64, 128),
                        depth=(1, 1, 2, 5), mlp_ratio=(2, 2, 2, 1.5),
                        num_heads=(1, 1, 1, 2), split_rates=(4, 4, 4, 4),
                        num_classes=10, share_channel=True)
    fm = RecNext(cfg=cfg)
    variables = _random_variables(fm, seed=5)
    state = flax_to_torch(variables)

    mod = load_ref_module("lsnet/model/recattn_share_channel.py", "ref_lsc_rev")
    tm = mod.RecNext(embed_dim=cfg.embed_dim, depth=cfg.depth,
                     mlp_ratios=cfg.mlp_ratio, split_rates=cfg.split_rates,
                     num_classes=cfg.num_classes).eval()
    _load_strict(tm, state)

    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    y_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_t = tm(to_nchw_tensor(x)).numpy()
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["m", "a", "l"])
def test_flax_fused_to_torch_strict_load_and_parity(family):
    """fuse_params output -> published-fused torch layout, loaded into the
    reference model after its own .fuse() surgery (publish.py's layout)."""
    cfg = SMALL[family]
    fm = RecNext(cfg=cfg)
    variables = _random_variables(fm, seed=7 + ord(family))
    fused = fuse_params(variables)
    state = flax_fused_to_torch(fused, family=family)

    tm = _torch_model(family, cfg).eval()
    tm.fuse()  # module surgery -> published fused layout
    _load_strict(tm, state)

    fmf = RecNext(cfg=cfg, fused=True)
    x = np.random.default_rng(3).normal(size=(2, 64, 64, 3)).astype(np.float32)
    y_j = np.asarray(fmf.apply(fused, jnp.asarray(x)))
    with torch.no_grad():
        y_t = tm(to_nchw_tensor(x)).numpy()
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


def test_fused_roundtrip_exact():
    """flax fused -> torch fused -> flax fused is exact (the synthesized BN
    decomposition must survive torch_fused_to_flax's w/sqrt(var+eps))."""
    cfg = SMALL["m"]
    fm = RecNext(cfg=cfg)
    fused = fuse_params(_random_variables(fm, seed=11))
    state = flax_fused_to_torch(fused, family="m", verify=False)
    rt = torch_fused_to_flax(state, family="m")
    flat_a = jax.tree_util.tree_leaves(fused["params"])
    flat_b = jax.tree_util.tree_leaves(rt["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


@pytest.mark.parametrize("variant", ["recconv", "recattn", "recattn_simple"])
def test_mlla_flax_to_torch_parity(variant):
    """MLLA reverse export loads into the reference mlla models (strict except
    the deterministic rope.rotations buffers) and reproduces flax logits."""
    from recnext_tpu.convert import mlla_flax_to_torch
    from recnext_tpu.models.mlla import MLLA
    from tests.test_mlla import REF_FILES, _small_cfg

    cfg = _small_cfg(variant)
    fm = MLLA(cfg=cfg)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))
    rng = np.random.default_rng(21)

    def rand(path, leaf):
        name = path[-1].key
        arr = rng.normal(size=leaf.shape).astype(np.float32) * 0.1
        if name == "var":
            arr = np.abs(arr) + 0.75
        if name == "scale":
            arr = arr + 1.0
        return jnp.asarray(arr)

    variables = jax.tree_util.tree_map_with_path(rand, variables)
    state = mlla_flax_to_torch(variables)  # verify=True round-trips internally

    mod = load_ref_module(REF_FILES[variant], f"ref_mlla_rev_{variant}")
    torch.manual_seed(0)
    kwargs = dict(img_size=cfg.img_size, num_classes=cfg.num_classes,
                  embed_dim=cfg.embed_dim, depths=list(cfg.depths),
                  drop_path_rate=0.0)
    if variant == "recconv":
        tm = mod.MLLA(expansion_ratio=cfg.expansion_ratio, **kwargs)
    else:
        tm = mod.MLLA(num_heads=list(cfg.num_heads), **kwargs)
    tm.eval()
    res = tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in state.items()}, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert all(k.endswith("rope.rotations") for k in res.missing_keys), res.missing_keys

    x = np.random.default_rng(22).normal(
        size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    y_j = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_t = tm(to_nchw_tensor(x)).numpy()
    np.testing.assert_allclose(y_j, y_t, atol=3e-4, rtol=1e-4)


def test_save_and_reload_torch_checkpoint(tmp_path):
    """save_torch_checkpoint writes a {'model': ...}-wrapped .pth that our own
    load_torch_checkpoint (and the reference's tolerant loaders) accept."""
    cfg = SMALL["m"]
    fm = RecNext(cfg=cfg)
    variables = _random_variables(fm, seed=13)
    p = str(tmp_path / "export.pth")
    save_torch_checkpoint(flax_to_torch(variables), p)
    rt = load_torch_checkpoint(p)
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(fm.apply(variables, jnp.asarray(x))),
        np.asarray(fm.apply(rt, jnp.asarray(x))))
