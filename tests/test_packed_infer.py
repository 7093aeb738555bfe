"""Lane-packed fused inference must be numerically EXACT vs the fused flax model
(same params, same op order — only the batch/channel layout differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.fusion import fuse_params
from recnext_tpu.models.packed_infer import lane_group, pack, packed_apply, unpack
from recnext_tpu.models.recnext import RecNext, RecNextConfig

CFG = RecNextConfig(name="tiny_m", family="m", embed_dim=(24, 48, 96, 192),
                    depth=(1, 1, 2, 1), mlp_ratio=(2, 2, 2, 2), num_classes=13)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(8, 6, 6, 24)).astype(np.float32))
    for g in (1, 2, 4, 8):
        z = pack(x, g)
        assert z.shape == (8 // g, 6, 6, 24 * g)
        np.testing.assert_array_equal(np.asarray(unpack(z, g, 8)), np.asarray(x))


def test_lane_group_rule():
    assert lane_group(48, 256) == 8    # 48*8 = 384 = 3 lane tiles
    assert lane_group(96, 256) == 4
    assert lane_group(192, 256) == 2
    assert lane_group(384, 256) == 1
    assert lane_group(40, 256) == 16   # 640 = 5 tiles
    assert lane_group(48, 4) == 4      # capped by batch divisibility
    assert lane_group(48, 3) == 1


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
