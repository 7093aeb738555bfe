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


@pytest.mark.parametrize("c,heads,g,fused_denom", [
    (160, 8, 1, False), (160, 8, 1, True), (320, 8, 2, False),
    (320, 8, 2, True), (80, 4, 1, False),
])
def test_blockdiag_matches_headbatch(c, heads, g, fused_denom, rng):
    """linear_attention_blockdiag (NHWC-layout masked-dense form, the round-5
    a-family lever) vs the shipping head-batched kv-first path: same real fp32
    products, so equal to reduction order."""
    from recnext_tpu.models.mixers import (
        _merge_heads_nhwc,
        _split_qk_nhwc,
        _split_v_nhwc,
    )
    from recnext_tpu.models.packed_infer import _packed_linear_attention
    from recnext_tpu.ops.attention import (
        feature_map,
        linear_attention_blockdiag,
        linear_attention_kv_first,
    )

    b, h, w = 3, 7, 7
    qk = feature_map(jnp.asarray(rng.standard_normal((b, h, w, 2 * c)),
                                 jnp.float32))
    v = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    if g == 1:
        q, k = _split_qk_nhwc(qk, heads, c // heads)
        vh = _split_v_nhwc(v, heads)
        ref = _merge_heads_nhwc(linear_attention_kv_first(q, k, vh), b, h, w, c)
    else:
        ref = _packed_linear_attention(qk, v, g, heads, (c // g) // heads,
                                       variant=1)
    got = linear_attention_blockdiag(qk, v, heads, groups=g,
                                     fused_denom=fused_denom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("c,heads", [(64, 4), (128, 8)])
def test_blockdiag_rope_matches_headbatch(c, heads, rng):
    """linear_attention_blockdiag_rope vs the MLLA head-batched rope path
    (models/mlla.py MLLALinearAttention rope=True): rotated q,k in the
    numerator, un-rotated in the denominator — same fp32 products, equal to
    reduction order."""
    from recnext_tpu.models.mlla import apply_rope, rope_rotations
    from recnext_tpu.ops.attention import linear_attention_blockdiag_rope

    b, h, w = 2, 8, 8
    n, hd = h * w, c // heads
    q = jnp.asarray(np.exp(rng.standard_normal((b, h, w, c)) * 0.3), jnp.float32)
    k = jnp.asarray(np.exp(rng.standard_normal((b, h, w, c)) * 0.3), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    cos, sin = rope_rotations(h, w, c)
    q_r, k_r = apply_rope(q, cos, sin), apply_rope(k, cos, sin)

    def heads_split(t):
        return jnp.transpose(t.reshape(b, n, heads, hd),
                             (0, 2, 1, 3)).reshape(b * heads, n, hd)

    s = float(n) ** -0.5
    vh = heads_split(v)
    kv = jnp.einsum("bnd,bne->bde", heads_split(k_r) * s,
                    vh.astype(jnp.float32) * s)
    num = jnp.einsum("bnd,bde->bne", heads_split(q_r), kv)
    k_mean = jnp.mean(heads_split(k).astype(jnp.float32), axis=-2)
    denom = jnp.einsum("bnd,bd->bn", heads_split(q).astype(jnp.float32),
                       k_mean) + 1e-6
    ref_h = num / denom[..., None]
    ref = jnp.transpose(ref_h.reshape(b, heads, n, hd),
                        (0, 2, 1, 3)).reshape(b, n, c)

    got = linear_attention_blockdiag_rope(
        q.reshape(b, n, c), k.reshape(b, n, c), q_r.reshape(b, n, c),
        k_r.reshape(b, n, c), v.reshape(b, n, c), heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
