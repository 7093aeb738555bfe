"""Token mixers: RecConv2d, LinearAttention 1/2/3, RecAttn2d.

Flax counterparts of the reference mixers:
* RecConv2d          — /root/reference/model/recnext.py:8-34
* LinearAttention1/2 — /root/reference/model/recattn.py:8-51
* LinearAttention3   — /root/reference/lsnet/model/recattn.py:89-112
* RecAttn2d          — /root/reference/model/recattn.py:54-67 (A series, LA2 at stage 3)
                       /root/reference/lsnet/model/recattn.py:115-127 (L series)
* PartialChannelOperation — /root/reference/lsnet/model/recattn.py:226-237

All activations are NHWC. The attention einsums are batched over (batch*heads) with n on
sublanes and head_dim on lanes, mapping straight onto the MXU; the 1/(q·mean(k)+eps)
normalizer stays in fp32 (documented bf16 instability, /root/reference/README.md:676).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from recnext_tpu.models.layers import Conv2d, ConvNorm
from recnext_tpu.ops.attention import linear_attention_kv_first, linear_attention_qk_first
from recnext_tpu.ops.recconv import rec_conv2d
from recnext_tpu.ops.resize import resize

Dtype = Any


class RecConv2dMixer(nn.Module):
    """Recursive multi-frequency depthwise conv; shared stride-2 `down` kernel plus
    level+1 per-level kernels. Reference: /root/reference/model/recnext.py:8-34."""

    level: int
    kernel_size: int = 5
    use_bias: bool = False
    mode: str = "bilinear"
    upsample: str = "gather"  # "gather" (VPU) or "matmul" (MXU einsum)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.kernel_size
        init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
        down_w = self.param("down_kernel", init, (k, k, 1, c), jnp.float32)
        conv_ws = tuple(
            self.param(f"conv{i}_kernel", init, (k, k, 1, c), jnp.float32)
            for i in range(self.level + 1)
        )
        down_b = None
        conv_bs = None
        if self.use_bias:
            down_b = self.param("down_bias", nn.initializers.zeros, (c,), jnp.float32)
            conv_bs = tuple(
                self.param(f"conv{i}_bias", nn.initializers.zeros, (c,), jnp.float32)
                for i in range(self.level + 1)
            )
        dt = self.dtype
        return rec_conv2d(
            x.astype(dt),
            down_w.astype(dt),
            tuple(w.astype(dt) for w in conv_ws),
            down_b,
            conv_bs,
            level=self.level,
            mode=self.mode,
            upsample=self.upsample,
        )


def _split_qk_nhwc(qk: jnp.ndarray, num_heads: int, head_dim: int):
    """(B,H,W,2*nh*hd) -> q, k each (B*nh, n, hd), matching torch's
    view(b, 2, nh, hd, n) channel decomposition (channel-major)."""
    b, h, w, _ = qk.shape
    n = h * w
    qk = qk.reshape(b, n, 2, num_heads, head_dim)
    qk = jnp.transpose(qk, (2, 0, 3, 1, 4))  # (2, b, nh, n, hd)
    q = qk[0].reshape(b * num_heads, n, head_dim)
    k = qk[1].reshape(b * num_heads, n, head_dim)
    return q, k


def _split_v_nhwc(v: jnp.ndarray, num_heads: int):
    b, h, w, c = v.shape
    n = h * w
    vh = v.reshape(b, n, num_heads, c // num_heads)
    vh = jnp.transpose(vh, (0, 2, 1, 3)).reshape(b * num_heads, n, c // num_heads)
    return vh


def _merge_heads_nhwc(o: jnp.ndarray, b: int, h: int, w: int, c: int) -> jnp.ndarray:
    nh = o.shape[0] // b
    o = o.reshape(b, nh, h * w, c // nh)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, h, w, c)
    return o


class LinearAttention(nn.Module):
    """ELU+1 mean-normalized linear attention with depthwise positional term.

    variant 1: kv-first O(n d^2); variant 2: qk-first O(n^2 d) (mathematically equal,
    asserted by the reference at /root/reference/lsnet/model/recattn.py:480-501);
    variant 3: halved heads, qk from a single dim-wide conv
    (/root/reference/lsnet/model/recattn.py:89-112).
    """

    num_heads: int
    variant: int = 1
    use_bias: bool = False  # ConvNorm conv bias (True on the L series)
    kernel: str = "elu"  # feature map: elu | softplus | relu (lsnet refinement)
    # variant-1 formulation: "blockdiag" computes the kv-first attention entirely
    # in the NHWC channel layout (one masked dense (C,C) contraction, no 6-D head
    # split/merge transposes — ops/attention.py:linear_attention_blockdiag);
    # measured +7-18% end-to-end on a0-a2 (PERF.md round 5). "headbatch" keeps the
    # per-head-einsum form as the A/B option. Equal to fp32 reduction order.
    # Variants 2 (qk-first, tiny-n stages) and 3 (rectangular head blocks) have no
    # channel-space blockdiag analog and always run head-batched.
    attn_impl: str = "blockdiag"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from recnext_tpu.ops.attention import feature_map, linear_attention_blockdiag

        b, h, w, c = x.shape
        kw = dict(use_bias=self.use_bias, fused=self.fused, dtype=self.dtype)
        if self.variant == 3:
            num_heads = self.num_heads // 2
            head_dim = c // num_heads // 2
            qk_conv = ConvNorm(c, 1, groups=1, name="qk", **kw)
        else:
            num_heads = self.num_heads
            head_dim = c // num_heads
            qk_conv = ConvNorm(c * 2, 1, groups=2, name="qk", **kw)
        pe_conv = ConvNorm(c, 3, padding=1, groups=c, name="pe", **kw)

        qk = feature_map(qk_conv(x, training=training), self.kernel)
        if self.variant == 1 and self.attn_impl in ("blockdiag", "blockdiag_fused"):
            o = linear_attention_blockdiag(
                qk, x, num_heads, fused_denom=(self.attn_impl == "blockdiag_fused")
            )
            return o + pe_conv(x, training=training)
        q, k = _split_qk_nhwc(qk, num_heads, head_dim)
        v = _split_v_nhwc(x, num_heads)
        if self.variant == 1:
            o = linear_attention_kv_first(q, k, v)
        else:
            o = linear_attention_qk_first(q, k, v)
        o = _merge_heads_nhwc(o, b, h, w, c)
        return o + pe_conv(x, training=training)


class RecAttn2d(nn.Module):
    """Single-level RecConv whose pyramid body is linear attention:
    conv(x + nearest_up(LA(dwconv_s2(x)))). Reference: /root/reference/model/recattn.py:54-67."""

    num_heads: int
    kernel_size: int = 5
    la_variant: int = 1
    use_bias: bool = False
    kernel: str = "elu"  # feature map: elu | softplus | relu (lsnet refinement)
    attn_impl: str = "blockdiag"  # variant-1 formulation (see LinearAttention)
    mode: str = "nearest"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.kernel_size
        kw = dict(use_bias=self.use_bias, fused=self.fused, dtype=self.dtype)
        y = ConvNorm(c, k, stride=2, padding=k // 2, groups=c, name="down", **kw)(
            x, training=training
        )
        y = LinearAttention(
            self.num_heads, variant=self.la_variant, kernel=self.kernel,
            attn_impl=self.attn_impl, name="attn", **kw
        )(y, training=training)
        y = resize(y, (x.shape[1], x.shape[2]), mode=self.mode)
        return ConvNorm(c, k, padding=k // 2, groups=c, name="conv", **kw)(
            x + y, training=training
        )


# NOTE: PartialChannelOperation (lsnet/model/recattn.py:226-237) is inlined in
# MetaNeXtBlockL (models/recnext.py) so the inner attention's params bind at block
# scope, matching the torch key layout token_mixer.attn.* -> attn.*.
