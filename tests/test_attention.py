"""Linear-attention core: kv-first == qk-first equivalence (the reference's own
invariant, /root/reference/lsnet/model/recattn.py:480-501) plus a torch cross-check."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.ops.attention import (
    linear_attention_kv_first,
    linear_attention_qk_first,
)

CASES = [
    (16, 2, 32),
    (64, 4, 16),
    (256, 8, 8),
    (128, 4, 4),
]


def _make_qkv(rng, dim, heads, res, dv_mult=1):
    n = res * res
    d = dim // heads
    # elu(x)+1 is strictly positive; emulate that distribution
    q = np.abs(rng.standard_normal((2 * heads, n, d))).astype(np.float32) + 0.1
    k = np.abs(rng.standard_normal((2 * heads, n, d))).astype(np.float32) + 0.1
    v = rng.standard_normal((2 * heads, n, d * dv_mult)).astype(np.float32)
    return q, k, v


@pytest.mark.parametrize("dim,heads,res", CASES)
def test_kv_first_equals_qk_first(dim, heads, res, rng):
    q, k, v = _make_qkv(rng, dim, heads, res)
    a = np.asarray(linear_attention_kv_first(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    b = np.asarray(linear_attention_qk_first(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("dim,heads,res", CASES[:2])
def test_matches_torch_math(dim, heads, res, rng):
    """Cross-check against an independent torch evaluation of the published formula."""
    q, k, v = _make_qkv(rng, dim, heads, res)
    n = q.shape[1]
    s = n**-0.5
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    kv = (kt * s).transpose(-1, -2) @ (vt * s)
    denom = qt @ kt.mean(dim=-2, keepdim=True).transpose(-1, -2) + 1e-6
    ref = ((qt @ kv) / denom).numpy()
    got = np.asarray(linear_attention_kv_first(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_la3_shaped_v(rng):
    """LinearAttention3 uses v with 2x the q/k head_dim — core must support dv != d."""
    q, k, v = _make_qkv(rng, 64, 4, 8, dv_mult=2)
    a = np.asarray(linear_attention_kv_first(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    b = np.asarray(linear_attention_qk_first(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    assert a.shape == v.shape
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)
