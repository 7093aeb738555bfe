"""MLLA ablation family — RecConv / RecAttn grafted into the MLLA (Swin-style,
"Demystify Mamba in Vision") architecture, used by the reference for ablations:

* mlla_recconv   — /root/reference/mlla/models/mlla_recconv.py (GELU gate,
  RecConv2d aggregator with nearest x2 upsample, expansion 2.5)
* mlla_recattn   — /root/reference/mlla/models/mlla_recattn.py (SiLU gate,
  RoPE linear attention inside a single-level RecAttn2d, expansion 2)
* mlla_recattn_simple — /root/reference/mlla/models/mlla_recattn_simple.py
  (SiLU gate, plain ELU+1 linear attention, i_proj dim->2dim)

Configs mlla_nano (dim 32, depths 2/2/4/2) and mlla_mini (dim 48, depths 2/4/8/4,
drop-path 0.2), heads (2,4,8,16), image size 256 (/root/reference/mlla/cfgs/*.yaml).
NHWC; LayerNorm-based (no BN fusion path); trains at 256 so the x2 pyramid is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import BatchNorm, Conv2d, DropPath, gelu
from recnext_tpu.ops.attention import (
    linear_attention_blockdiag,
    linear_attention_blockdiag_rope,
    linear_attention_kv_first,
)
from recnext_tpu.ops.recconv import rec_conv2d
from recnext_tpu.ops.resize import resize

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MLLAConfig:
    name: str
    variant: str  # "recconv" | "recattn" | "recattn_simple"
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 4, 8, 4)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    expansion_ratio: float = 2.5  # recconv; recattn uses 2, simple fixed 2
    drop_path: float = 0.0
    num_classes: int = 1000
    img_size: int = 256
    # linear-attention formulation: "headbatch" (per-head einsums, the round-4
    # shipping form) or "blockdiag" (channel-layout head-masked dense
    # contraction, the recnext a-family round-5 winner — measured for MLLA in
    # PERF.md before any default change)
    attn_impl: str = "headbatch"


class ConvLayer(nn.Module):
    """conv + optional BN + optional ReLU (mlla Stem building block)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    norm: bool = True
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = Conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=self.use_bias, dtype=self.dtype,
                   name="conv")(x)
        if self.norm:
            x = BatchNorm(name="bn")(x, training=training)
        if self.act:
            x = nn.relu(x)
        return x


class MLLAStem(nn.Module):
    """conv1 s2 -> residual double conv -> conv3 (s2 expand 4x then 1x1 project)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        d = self.embed_dim
        kw = dict(kernel_size=3, padding=1, use_bias=False, dtype=self.dtype)
        x = ConvLayer(d // 2, stride=2, name="conv1", **kw)(x, training=training)
        y = ConvLayer(d // 2, name="conv2_0", **kw)(x, training=training)
        y = ConvLayer(d // 2, act=False, name="conv2_1", **kw)(y, training=training)
        x = x + y
        x = ConvLayer(d * 4, stride=2, name="conv3_0", **kw)(x, training=training)
        return ConvLayer(d, kernel_size=1, padding=0, act=False, use_bias=False,
                         dtype=self.dtype, name="conv3_1")(x, training=training)


def rope_rotations(h: int, w: int, dim: int, base: float = 10000.0) -> np.ndarray:
    """2-D rotary embedding angles -> (h, w, dim/2) complex rotations as (cos, sin).
    Reference: mlla_recattn.py RoPE.__init__ (k_max = dim/4 per spatial axis)."""
    k_max = dim // 4
    theta = 1.0 / (base ** (np.arange(k_max) / k_max))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    angles = np.concatenate([ys[..., None] * theta, xs[..., None] * theta], axis=-1)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) float32; complex multiply on (re, im) channel pairs."""
    xf = x.astype(jnp.float32)
    re, im = xf[..., 0::2], xf[..., 1::2]
    out_re = re * cos - im * sin
    out_im = re * sin + im * cos
    return jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)


class MLLALinearAttention(nn.Module):
    """ELU+1 linear attention; rope=True adds 2-D RoPE on q,k in the numerator only
    (denominator uses the un-rotated features) — mlla_recattn.py:49-79."""

    num_heads: int
    rope: bool = False
    qkv_bias: bool = True
    attn_impl: str = "headbatch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        nh, hd = self.num_heads, c // self.num_heads
        qk = Conv2d(c * 2, 1, groups=2, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qk")(x)
        qk = jax.nn.elu(qk) + 1.0
        q, k = qk[..., :c], qk[..., c:]
        pe_name = "lepe" if self.rope else "pe"
        pe = Conv2d(c, 3, padding=1, groups=c, use_bias=self.qkv_bias if self.rope else True,
                    dtype=self.dtype, name=pe_name)(x)

        if self.attn_impl == "blockdiag":
            # channel-layout formulation: no head split/merge transposes
            # (ops/attention.py; reduction-order-equal to the head-batched path)
            if self.rope:
                cos, sin = rope_rotations(h, w, c)
                o = linear_attention_blockdiag_rope(
                    q.reshape(b, n, c), k.reshape(b, n, c),
                    apply_rope(q, cos, sin).reshape(b, n, c),
                    apply_rope(k, cos, sin).reshape(b, n, c),
                    x.reshape(b, n, c), nh).reshape(b, h, w, c)
            else:
                o = linear_attention_blockdiag(qk, x, nh)
            return o + pe

        def heads(t):  # (B,H,W,C) -> (B*nh, n, hd), channel-major head split
            return jnp.transpose(t.reshape(b, n, nh, hd), (0, 2, 1, 3)).reshape(b * nh, n, hd)

        v = heads(x)
        if self.rope:
            cos, sin = rope_rotations(h, w, c)
            q_r, k_r = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
            qh, kh = heads(q).astype(jnp.float32), heads(k).astype(jnp.float32)
            qrh, krh = heads(q_r), heads(k_r)
            s = float(n) ** -0.5
            kv = jnp.einsum("bnd,bne->bde", krh * s, v.astype(jnp.float32) * s)
            num = jnp.einsum("bnd,bde->bne", qrh, kv)
            k_mean = jnp.mean(kh, axis=-2)
            denom = jnp.einsum("bnd,bd->bn", qh, k_mean) + 1e-6
            o = (num / denom[..., None]).astype(x.dtype)
        else:
            o = linear_attention_kv_first(heads(q), heads(k), v)
        o = jnp.transpose(o.reshape(b, nh, n, hd), (0, 2, 1, 3)).reshape(b, h, w, c)
        return o + pe


class MLLARecConvAgg(nn.Module):
    """RecConv2d with fixed nearest x2 upsample (mlla_recconv.py:20-51) — requires
    even spatial sizes (trained at 256)."""

    level: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.kernel_size
        init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
        down_w = self.param("down_kernel", init, (k, k, 1, c), jnp.float32).astype(self.dtype)
        conv_ws = tuple(
            self.param(f"conv{i}_kernel", init, (k, k, 1, c), jnp.float32).astype(self.dtype)
            for i in range(self.level + 1))
        # the shared pyramid op: on even sizes the recorded-size nearest upsample
        # equals the fixed x2 of mlla_recconv.py, so future rec_conv2d policy
        # work (upsample forms, taps backward) applies here automatically
        return rec_conv2d(x, down_w, conv_ws, level=self.level, mode="nearest")


class MLLARecAttnAgg(nn.Module):
    """Single-level attention pyramid: conv(x + up2(LA(dw_s2(x)))) with plain convs
    (no BN) — mlla_recattn.py:83-96 / mlla_recattn_simple.py:43-56."""

    num_heads: int
    rope: bool = False
    attn_impl: str = "headbatch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = Conv2d(c, 5, stride=2, padding=2, groups=c, use_bias=True,
                   dtype=self.dtype, name="down")(x)
        y = MLLALinearAttention(self.num_heads, rope=self.rope,
                                attn_impl=self.attn_impl, dtype=self.dtype,
                                name="attn")(y)
        y = resize(y, (y.shape[1] * 2, y.shape[2] * 2), mode="nearest")
        return Conv2d(c, 5, padding=2, groups=c, use_bias=True, dtype=self.dtype,
                      name="conv")(x + y)


class MLLABlock(nn.Module):
    """cpe1 (+res unless downsampling) -> gated aggregation -> cpe2 res -> MLP res."""

    variant: str
    level: int
    num_heads: int
    mlp_ratio: float = 4.0
    expansion_ratio: float = 2.5
    drop_path: float = 0.0
    downsample: bool = False
    attn_impl: str = "headbatch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        stride = 2 if self.downsample else 1
        dim = cin * stride
        cpe1 = Conv2d(dim, 5, stride=stride, padding=2, groups=cin, use_bias=True,
                      dtype=self.dtype, name="cpe1")(x)
        x = cpe1 if self.downsample else x + cpe1

        if self.variant == "recattn_simple":
            hidden = dim * 2
        elif self.variant == "recattn":
            hidden = int(dim * 2)
        else:
            hidden = int(dim * self.expansion_ratio)
        g_dim = hidden // 2

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = nn.Dense(hidden, dtype=self.dtype, name="i_proj")(y)
        g, cfeat = y[..., :g_dim], y[..., g_dim:]
        if self.variant == "recconv":
            g = gelu(g)
            agg = MLLARecConvAgg(level=self.level, dtype=self.dtype, name="agg")(cfeat)
        elif self.variant == "recattn":
            g = nn.silu(g)
            agg = MLLARecAttnAgg(self.num_heads, rope=True, dtype=self.dtype,
                                 attn_impl=self.attn_impl, name="agg")(cfeat)
        else:
            g = nn.silu(g)
            agg = MLLARecAttnAgg(self.num_heads, rope=False, dtype=self.dtype,
                                 attn_impl=self.attn_impl, name="agg")(cfeat)
        o = Conv2d(dim, 1, use_bias=True, dtype=self.dtype, name="o_proj")(g * agg)
        x = x + DropPath(self.drop_path, name="dp1")(o, training=training)

        x = x + Conv2d(dim, 3, padding=1, groups=dim, use_bias=True, dtype=self.dtype,
                       name="cpe2")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, training=training)


class MLLA(nn.Module):
    cfg: MLLAConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        x = MLLAStem(cfg.embed_dim, dtype=self.dtype, name="stem")(x, training=training)
        dpr = np.linspace(0, cfg.drop_path, sum(cfg.depths))
        idx = 0
        n_layers = len(cfg.depths)
        for i, depth in enumerate(cfg.depths):
            rates = dpr[idx: idx + depth]
            idx += depth
            common = dict(variant=cfg.variant, num_heads=cfg.num_heads[i],
                          mlp_ratio=cfg.mlp_ratio, expansion_ratio=cfg.expansion_ratio,
                          attn_impl=cfg.attn_impl, dtype=self.dtype)
            for j in range(depth):
                x = MLLABlock(level=4 - i, drop_path=float(rates[j]),
                              name=f"layer{i}_block{j}", **common)(x, training=training)
            if i < n_layers - 1:
                x = MLLABlock(level=4 - i - 1, drop_path=float(rates[-1]),
                              downsample=True, name=f"layer{i}_down", **common)(
                                  x, training=training)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = nn.LayerNorm(name="norm")(x)
        if cfg.num_classes > 0:
            x = nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(x)
        return x


MLLA_CONFIGS = {
    f"mlla_{size}_{var}": MLLAConfig(
        name=f"mlla_{size}_{var}", variant=var,
        embed_dim=32 if size == "nano" else 48,
        depths=(2, 2, 4, 2) if size == "nano" else (2, 4, 8, 4),
        drop_path=0.0 if size == "nano" else 0.2,
        expansion_ratio=2.5 if var == "recconv" else 2.0,
    )
    for size in ("nano", "mini")
    for var in ("recconv", "recattn", "recattn_simple")
}


def create_mlla(name: str, **overrides) -> MLLA:
    # dtype is a module field, not an MLLAConfig field — pop it BEFORE replace
    dtype = overrides.pop("dtype", jnp.float32)
    cfg = dataclasses.replace(MLLA_CONFIGS[name], **overrides)
    return MLLA(cfg=cfg, dtype=dtype)
