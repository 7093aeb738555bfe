"""Lane-packed fused inference must be numerically EXACT vs the fused flax model
(same params, same op order — only the batch/channel layout differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.packed_infer import pack, packed_apply, unpack
from recnext_tpu.models.recnext import RecNext, RecNextConfig

CFG = RecNextConfig(name="tiny_m", family="m", embed_dim=(24, 48, 96, 192),
                    depth=(1, 1, 2, 1), mlp_ratio=(2, 2, 2, 2), num_classes=13)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(8, 6, 6, 24)).astype(np.float32))
    for g in (1, 2, 4, 8):
        z = pack(x, g)
        assert z.shape == (8 // g, 6, 6, 24 * g)
        np.testing.assert_array_equal(np.asarray(unpack(z, g, 8)), np.asarray(x))


@pytest.mark.parametrize("group", [1, 2, 4])
def test_packed_matches_fused_apply(rng, group):
    model = RecNext(cfg=CFG)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    # make BN stats non-trivial before fusing
    variables = jax.tree.map(
        lambda v: v + 0.05 * np.random.default_rng(1).normal(size=v.shape)
        .astype(v.dtype), variables)
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=CFG, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    got = np.asarray(packed_apply(fused_vars, CFG, x, group=group))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


def test_packed_default_group_and_features_dim(rng):
    model = RecNext(cfg=CFG)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=CFG, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    got = np.asarray(packed_apply(fused_vars, CFG, x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


CFG_A = RecNextConfig(name="tiny_a", family="a", embed_dim=(24, 48, 96, 192),
                      depth=(1, 1, 2, 1), mlp_ratio=(2, 2, 2, 2), num_classes=13)


@pytest.mark.parametrize("group", [1, 2, 4])
def test_packed_matches_fused_apply_a_family(rng, group):
    model = RecNext(cfg=CFG_A)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    variables = jax.tree.map(
        lambda v: v + 0.05 * np.random.default_rng(1).normal(size=v.shape)
        .astype(v.dtype), variables)
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=CFG_A, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    got = np.asarray(packed_apply(fused_vars, CFG_A, x, group=group))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)
    # the MXU-matmul form of the nearest upsample is the same function
    # (measured neutral-to-slower on v5e — PERF.md; kept selectable)
    got_mm = np.asarray(packed_apply(fused_vars, CFG_A, x, group=group,
                                     nearest_upsample="matmul"))
    np.testing.assert_allclose(got_mm, want, atol=2e-4, rtol=2e-5)


def test_packed_default_groups_a_family(rng):
    model = RecNext(cfg=CFG_A)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=CFG_A, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    got = np.asarray(packed_apply(fused_vars, CFG_A, x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


def test_packed_a_family_softplus_kernel(rng):
    cfg = RecNextConfig(name="tiny_a_sp", family="a", embed_dim=(24, 48, 96, 192),
                        depth=(1, 0, 1, 1), mlp_ratio=(2, 2, 2, 2), num_classes=7,
                        attn_kernel="softplus")
    model = RecNext(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=cfg, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    got = np.asarray(packed_apply(fused_vars, cfg, x, group=2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)


@pytest.mark.parametrize("family_cfg", [CFG, CFG_A], ids=["m", "a"])
def test_packed_blockdiag_mlp_matches_fused(rng, family_cfg):
    """mlp_mode='blockdiag' re-expresses the grouped 1x1 mlp as ONE dense
    contraction with exact-zero off-diagonal blocks — same products, different
    reduction-tree shape, so parity is to fp32-reassociation tolerance."""
    model = RecNext(cfg=family_cfg)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    variables = jax.tree.map(
        lambda v: v + 0.05 * np.random.default_rng(1).normal(size=v.shape)
        .astype(v.dtype), variables)
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=family_cfg, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    for g in (2, 4):
        got = np.asarray(packed_apply(fused_vars, family_cfg, x, group=g,
                                      mlp_mode="blockdiag"))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)
    with pytest.raises(AssertionError):
        packed_apply(fused_vars, family_cfg, x, mlp_mode="nope")


def test_default_groups_policy():
    from recnext_tpu.models.packed_infer import MEASURED_GROUPS, default_groups
    from recnext_tpu.models.registry import get_config

    # measured table is honored (and batch-capped)
    assert default_groups(get_config("recnext_m0"), 256) == (1, 1, 4, 2)
    assert default_groups(get_config("recnext_m0"), 2) == (1, 1, 2, 2)
    assert default_groups(get_config("recnext_a5"), 256) == (1, 4, 2, 1)
    # aligned variants pack nothing (m3 measured; m4 measured explicit all-1s)
    assert default_groups(get_config("recnext_m3"), 256) == (1, 1, 1, 1)
    assert default_groups(get_config("recnext_m4"), 256) == (1, 1, 1, 1)
    # a4: round-3 sweep found stage-2 g=2 pays (+16.3%) despite exact alignment
    assert default_groups(get_config("recnext_a4"), 256) == (1, 1, 2, 1)
    assert default_groups(get_config("recnext_a4"), 2) == (1, 1, 2, 1)
    # fallback rule: g=2 only on exact 128-alignment (C >= 128, C % 128 == 64)
    cfg = get_config("recnext_m1")
    assert cfg.name in MEASURED_GROUPS
    unlisted = CFG  # (24, 48, 96, 192): only stage 3 is >=128 and =64 mod 128
    assert default_groups(unlisted, 8) == (1, 1, 1, 2)
    assert default_groups(unlisted, 3) == (1, 1, 1, 1)  # batch not divisible


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "recnext_m0", "recnext_m1", "recnext_m2", "recnext_m3", "recnext_m4",
    "recnext_m5", "recnext_a0", "recnext_a1", "recnext_a2", "recnext_a3",
    "recnext_a4", "recnext_a5"])
def test_packed_exact_every_registry_variant(rng, name):
    """Every shipped MEASURED_GROUPS policy (and the fallback) is numerically
    exact on its real variant config."""
    from recnext_tpu.models.registry import get_config

    cfg = get_config(name, num_classes=11)
    model = RecNext(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(8, 96, 96, 3)).astype(np.float32))
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x[:1])
    gen = np.random.default_rng(3)

    def fill(path, s):
        arr = gen.normal(scale=0.05, size=s.shape)
        # BN variances must be POSITIVE or fuse_params' sqrt(var+eps) NaNs the
        # whole tree and NaN==NaN vacuously passes (assert_allclose equal_nan
        # default) — the historical failure mode of this very test
        if path[-1].key == "var":
            arr = np.abs(arr) + 0.5
        return jnp.asarray(arr, s.dtype)

    variables = jax.tree_util.tree_map_with_path(fill, variables)
    fused_vars = fuse_params(variables)
    fused = RecNext(cfg=cfg, fused=True)
    want = np.asarray(fused.apply(fused_vars, x, training=False))
    assert np.isfinite(want).all(), "oracle output not finite — test would be vacuous"
    got = np.asarray(packed_apply(fused_vars, cfg, x))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-5)
