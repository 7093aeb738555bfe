"""Structural layers: BatchNorm (PyTorch semantics), ConvNorm, NormLinear, Mlp,
DropPath, RepVGGDW.

Every layer has an *unfused* (train/eval) and a *fused* (inference) structure; the
pure parameter transform between them lives in recnext_tpu/fusion.py and mirrors the
reference's `.fuse()` methods (/root/reference/model/recnext.py:75-122,
/root/reference/lsnet/model/recattn.py:8-34) as pytree math.

TPU notes: activations are NHWC so the channel axis rides the 128-lane dimension; BN
statistics are computed in fp32 regardless of the compute dtype; under jit with a
batch-sharded mesh, the batch-stat reductions are global-batch reductions, so
cross-replica "SyncBN" (reference detection/recnext.py:210) falls out for free.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from recnext_tpu.ops.conv import conv2d, depthwise_conv2d

Dtype = Any


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default, NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


# Frozen-BN marker (detection/recnext.py:266-272 train(): ONLY BatchNorm modules
# are .eval()-ed while DropPath/dropout stay active). RecNext sets this around
# its forward from cfg.frozen_stats; BatchNorm consults it so the flag doesn't
# have to be threaded through every intermediate module's call signature. It is
# read at TRACE time only and is set deterministically from a static module
# field, so jit caching (keyed on the module config) stays sound.
import contextvars as _contextvars

_FROZEN_BN = _contextvars.ContextVar("recnext_frozen_bn", default=False)


class frozen_bn_scope:
    """Context manager: BatchNorm layers inside use running stats even when
    called with training=True (and write no batch_stats updates)."""

    def __init__(self, frozen: bool):
        self._frozen = bool(frozen)

    def __enter__(self):
        self._token = _FROZEN_BN.set(self._frozen)

    def __exit__(self, *exc):
        _FROZEN_BN.reset(self._token)
        return False


class BatchNorm(nn.Module):
    """BatchNorm with PyTorch-exact semantics.

    * normalization uses biased batch variance, running stats use unbiased variance
      (factor n/(n-1)), matching torch.nn.BatchNorm2d;
    * torch momentum convention: new = (1 - momentum) * old + momentum * batch;
    * stats and normalization are computed in fp32; output is cast back to x.dtype.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    weight_init: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.constant(self.weight_init), (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))

        xf = x.astype(jnp.float32)
        if training and _FROZEN_BN.get():
            training = False  # frozen-BN mode: running stats, no updates
        if training:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            # two-pass (torch-style) variance: E[(x-mean)^2] cannot go negative,
            # unlike E[x^2]-E[x]^2 whose fp32 cancellation can NaN the rsqrt
            # when |mean| >> std
            var = jnp.mean(jnp.square(xf - mean), axis=red)
            if not self.is_initializing():
                n = 1
                for a in red:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class FusedAffine(nn.Module):
    """Inference form of a standalone BatchNorm: y = x*scale + shift (fused params)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        shift = self.param("shift", nn.initializers.zeros, (feat,), jnp.float32)
        return (x * scale.astype(x.dtype)) + shift.astype(x.dtype)


class Conv2d(nn.Module):
    """Plain conv with HWIO kernel and optional bias (torch Conv2d counterpart).

    kernel_init/bias_init override the He default — detection prediction layers
    need mmdet's Normal(std=0.01) (+ focal-prior bias) or their initial outputs
    inherit the full feature scale and the losses start ~50x too large."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init or
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (k, k, cin // self.groups, self.out_channels),
            jnp.float32,
        )
        b = None
        if self.use_bias:
            b = self.param("bias", self.bias_init or nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
        if self.groups == cin and self.out_channels == cin and cin > 1:
            # fully-depthwise: route through depthwise_conv2d so the taps
            # backward policy applies (RepVGGDW's 7x7/3x3 filter grads are
            # 2.8-6.9x cheaper that way — PERF.md round-3 backward campaign)
            return depthwise_conv2d(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                b,
                stride=self.stride,
                padding=self.padding,
            )
        return conv2d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            b,
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
        )


class ConvNorm(nn.Module):
    """Conv2d + BatchNorm2d; fused form is a single conv with bias.

    Reference: /root/reference/model/recattn.py:70-111 (bias=False default, M/A) and
    /root/reference/lsnet/model/recattn.py:130-171 (bias=True default, L series).
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = False
    bn_weight_init: float = 1.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        conv = Conv2d(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
            use_bias=True if self.fused else self.use_bias,
            dtype=self.dtype,
            name="conv",
        )
        y = conv(x)
        if self.fused:
            return y
        return BatchNorm(weight_init=self.bn_weight_init, name="norm")(y, training=training)


class NormLinear(nn.Module):
    """BatchNorm1d + Linear (classifier head half); fused form is a single Linear.

    Reference: /root/reference/model/recnext.py:100-122.
    """

    out_features: int
    use_bias: bool = True
    std: float = 0.02
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if not self.fused:
            x = BatchNorm(name="norm")(x, training=training)
        dense = nn.Dense(
            self.out_features,
            use_bias=True if self.fused else self.use_bias,
            kernel_init=nn.initializers.truncated_normal(self.std, lower=-2.0, upper=2.0),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )
        return dense(x)


class Mlp(nn.Module):
    """1x1 ConvNorm -> GELU -> 1x1 ConvNorm channel mixer (no internal residual).

    Reference: /root/reference/model/recnext.py:125-131.
    """

    hidden_channels: int
    out_channels: int
    use_bias: bool = False
    fused: bool = False
    dtype: Dtype = jnp.float32
    act: Callable = gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        kw = dict(use_bias=self.use_bias, fused=self.fused, dtype=self.dtype)
        x = ConvNorm(self.hidden_channels, 1, name="fc1", **kw)(x, training=training)
        x = self.act(x)
        return ConvNorm(self.out_channels, 1, name="fc2", **kw)(x, training=training)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath counterpart)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.rate == 0.0 or not training:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class RepVGGDW(nn.Module):
    """Reparameterizable depthwise block: 3x3 DW ConvNorm + 1x1 DW ConvNorm + identity;
    fused at inference into one 3x3 depthwise conv.

    Reference: /root/reference/lsnet/model/recattn.py:8-34.
    """

    use_bias: bool = True
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        if self.fused:
            return Conv2d(c, 3, padding=1, groups=c, use_bias=True, dtype=self.dtype, name="conv")(x)
        kw = dict(groups=c, use_bias=self.use_bias, dtype=self.dtype)
        lk = ConvNorm(c, 3, padding=1, name="lk", **kw)(x, training=training)
        sk = ConvNorm(c, 1, padding=0, name="sk", **kw)(x, training=training)
        return lk + sk + x
