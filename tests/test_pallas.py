"""Pallas kernels vs jnp references (interpret mode on CPU) — the TPU counterpart of
the reference's Triton-vs-eager asserts (/root/reference/lsnet/model/triton.py:225-259)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.ops.attention import linear_attention_kv_first, linear_attention_qk_first
from recnext_tpu.ops.pallas.linear_attention import pallas_linear_attention


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
