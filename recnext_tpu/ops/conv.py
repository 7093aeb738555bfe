"""NHWC convolution primitives on top of lax.conv_general_dilated.

Kernels are stored HWIO (kh, kw, in_channels // groups, out_channels), the layout XLA
TPU prefers; PyTorch OIHW weights are transposed once at import time
(recnext_tpu/convert.py). Group/output channel ordering matches PyTorch's group-major
convention, so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import functools
import os

import jax
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


# Measured NET-NEGATIVE end-to-end; kept opt-in for experiments
# (RECNEXT_DW_TAPS_VJP=1). The taps backward looked 2.7-4.2x faster per-op,
# but those micros used a mean() loss whose CONSTANT cotangent lets XLA
# algebraically collapse the taps filter grad; with real cotangents the conv
# lowering wins composed at 56^2 (2.43 vs 5.13 ms) and in composition the
# policy regressed the full m1 train step 1970 -> 1536 img/s (stride-1-only)
# and 1031 (all strides). Full numbers: PERF.md round-3 "backward campaign".
DW_TAPS_VJP = os.environ.get("RECNEXT_DW_TAPS_VJP", "0") == "1"

# Honest-cotangent shape window where taps still wins per-op: 14^2..28^2
# (28^2: 1.98 vs 3.03; 14^2: 1.66 vs 2.07; 56^2 and 7^2 lose).
_TAPS_AREA_MIN = 100
_TAPS_AREA_MAX = 784


@functools.lru_cache(maxsize=None)
def _dw_taps_grad_fn(stride: int, padding: int):
    """Depthwise conv with the conv lowering FORWARD and the taps-decomposition
    BACKWARD (jax.custom_vjp) — k*k shifted multiply-reduces, the VPU-native
    expression of the same contraction, instead of XLA's batch-grouped-conv
    filter gradient. The two backwards are the same sum reassociated, so
    gradients agree to float tolerance (tests/test_recconv.py grad-parity
    test). See DW_TAPS_VJP above for why this is NOT the default."""

    def fwd_impl(x, w):
        return conv2d(x, w, stride=stride, padding=padding, groups=w.shape[-1])

    def taps_impl(x, w):
        return depthwise_conv2d_taps(x, w, stride=stride, padding=padding)

    f = jax.custom_vjp(fwd_impl)

    def f_fwd(x, w):
        return fwd_impl(x, w), (x, w)

    def f_bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(taps_impl, x, w)
        return vjp(g)  # taps primal output is DCE'd: the op is bilinear in (x, w)

    f.defvjp(f_fwd, f_bwd)
    return f


def depthwise_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
) -> jnp.ndarray:
    """Depthwise conv: w is (kh, kw, 1, C), feature_group_count = C.

    With DW_TAPS_VJP enabled (opt-in, measured net-negative — see above), the
    backward of stride-1 convs with output area >= 100 runs through the taps
    decomposition; stride-2 always stays on the conv autodiff (the taps
    backward there scatters into strided positions — the sublane-strided
    pattern round 1 measured at ~30x)."""
    st = stride if isinstance(stride, int) else stride[0]
    pd = padding if isinstance(padding, int) else padding[0]
    simple = (isinstance(stride, int) or stride[0] == stride[1]) and (
        isinstance(padding, int) or padding[0] == padding[1])
    if DW_TAPS_VJP and simple and st == 1:
        k = int(w.shape[0])
        oh = (int(x.shape[1]) + 2 * pd - k) // st + 1
        ow = (int(x.shape[2]) + 2 * pd - k) // st + 1
        if _TAPS_AREA_MIN <= oh * ow <= _TAPS_AREA_MAX:
            out = _dw_taps_grad_fn(st, pd)(x, w)
            if b is not None:
                out = out + b.astype(out.dtype)
            return out
    return conv2d(x, w, b, stride=stride, padding=padding, groups=w.shape[-1])


def depthwise_conv2d_taps(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Depthwise conv decomposed into k*k shifted multiply-adds.

    On TPU, XLA fuses the pad + strided slices + MACs into ONE elementwise loop with
    memory traffic ~ input+output, whereas the conv lowering for small channel counts
    runs far off the bandwidth roofline (measured ~7x on v5e for C=48). Numerically
    identical to depthwise_conv2d (pure sum reassociation)."""
    k = int(w.shape[0])
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h, wd = int(x.shape[1]), int(x.shape[2])
    oh = (h + 2 * padding - k) // stride + 1
    ow = (wd + 2 * padding - k) // stride + 1
    out = None
    for dh in range(k):
        for dw in range(k):
            sl = jax.lax.slice(
                xp,
                (0, dh, dw, 0),
                (xp.shape[0], dh + (oh - 1) * stride + 1, dw + (ow - 1) * stride + 1,
                 xp.shape[3]),
                (1, stride, stride, 1),
            )
            term = sl * w[dh, dw, 0].astype(x.dtype)
            out = term if out is None else out + term
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
