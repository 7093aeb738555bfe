"""NHWC convolution primitives on top of lax.conv_general_dilated.

Kernels are stored HWIO (kh, kw, in_channels // groups, out_channels), the layout XLA
TPU prefers; PyTorch OIHW weights are transposed once at import time
(recnext_tpu/convert.py). Group/output channel ordering matches PyTorch's group-major
convention, so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int | tuple[int, int] = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """2D convolution, NHWC activations, HWIO weights, integer symmetric padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def depthwise_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
) -> jnp.ndarray:
    """Depthwise conv: w is (kh, kw, 1, C), feature_group_count = C."""
    return conv2d(x, w, b, stride=stride, padding=padding, groups=w.shape[-1])
