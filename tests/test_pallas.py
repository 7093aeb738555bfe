"""Pallas kernels vs jnp references (interpret mode on CPU) — the TPU counterpart of
the reference's Triton-vs-eager asserts (/root/reference/lsnet/model/triton.py:225-259)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.ops.attention import linear_attention_kv_first, linear_attention_qk_first
from recnext_tpu.ops.pallas.linear_attention import pallas_linear_attention


@pytest.mark.parametrize("h,c,level", [(14, 192, 2), (15, 32, 2), (7, 64, 1),
                                       (28, 48, 3)])
def test_pallas_recconv_matches_jnp(h, c, level):
    from recnext_tpu.ops.pallas.recconv import pallas_rec_conv2d
    from recnext_tpu.ops.recconv import rec_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, h, h, c)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(5, 5, 1, c)).astype(np.float32))
    cws = tuple(jnp.asarray(rng.normal(size=(5, 5, 1, c)).astype(np.float32))
                for _ in range(level + 1))
    want = np.asarray(rec_conv2d(x, dw, cws, level=level, mode="bilinear"))
    got = np.asarray(pallas_rec_conv2d(x, dw, cws, level=level, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5,
                               atol=2e-5 * np.abs(want).max())


@pytest.mark.parametrize("bh,n,d,dv", [
    (2, 16, 32, 32),     # reference test shape (dim 64, heads 2, res 4)
    (4, 64, 64, 64),     # (dim 128/256 shapes)
    (2, 49, 20, 20),     # odd n (7x7 map), odd d — padding path
    (2, 196, 20, 40),    # dv != d (LinearAttention3)
])
def test_pallas_linear_attention_matches_jnp(bh, n, d, dv):
    rng = np.random.default_rng(0)
    # elu(x)+1 features are positive — replicate that for realistic normalizer values
    q = jnp.asarray(np.abs(rng.normal(size=(bh, n, d))).astype(np.float32)) + 0.1
    k = jnp.asarray(np.abs(rng.normal(size=(bh, n, d))).astype(np.float32)) + 0.1
    v = jnp.asarray(rng.normal(size=(bh, n, dv)).astype(np.float32))

    want = linear_attention_kv_first(q, k, v)
    got = pallas_linear_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)

    want_qk = linear_attention_qk_first(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_qk), atol=1e-3, rtol=1e-3)
