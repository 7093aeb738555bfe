"""RecConv2d — recursive multi-frequency depthwise convolution, functional form.

Behavioural spec (reference: /root/reference/model/recnext.py:8-34): build an
``level``-deep stride-2 depthwise-conv pyramid with a single shared ``down`` kernel,
then from the coarsest level upward compute ``x = resize(conv_l(f_l + x), prev_size)``
and finally ``conv_level(input + x)``. Effective receptive field grows as k * 2^level
while parameters grow only (level+2)x.

TPU-first notes: the level loop is a Python loop over *static* per-level shapes (level
<= 4), so XLA sees a fully unrolled straight-line graph of depthwise convs + gathers it
can pipeline; all tensors NHWC so channels ride the 128-wide lane dimension. The fused
single-dispatch Pallas variant lives in recnext_tpu/ops/pallas/recconv.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from recnext_tpu.ops.conv import depthwise_conv2d
from recnext_tpu.ops.resize import resize, resize_matmul


def rec_conv2d(
    x: jnp.ndarray,
    down_w: jnp.ndarray,
    conv_ws: tuple[jnp.ndarray, ...],
    down_b: jnp.ndarray | None = None,
    conv_bs: tuple[jnp.ndarray | None, ...] | None = None,
    *,
    level: int,
    mode: str = "bilinear",
    upsample: str = "gather",  # "gather" (VPU take) or "matmul" (MXU einsum)
) -> jnp.ndarray:
    """Apply RecConv2d. x: NHWC; down_w/conv_ws: depthwise HWIO (k,k,1,C).

    ``conv_ws`` has ``level+1`` kernels: convs[0] applies at the coarsest pyramid
    level, convs[level] is the final full-resolution conv.
    """
    assert len(conv_ws) == level + 1
    if conv_bs is None:
        conv_bs = (None,) * (level + 1)
    k = int(down_w.shape[0])
    pad = k // 2

    inp = x
    features: list[tuple[jnp.ndarray, tuple[int, int]]] = []
    for _ in range(level):
        size = (int(x.shape[1]), int(x.shape[2]))
        x = depthwise_conv2d(x, down_w, down_b, stride=2, padding=pad)
        features.append((x, size))

    up = resize_matmul if upsample == "matmul" else resize
    acc = None
    for lvl, (f, size) in enumerate(reversed(features)):
        h = f if acc is None else f + acc
        h = depthwise_conv2d(h, conv_ws[lvl], conv_bs[lvl], stride=1, padding=pad)
        acc = up(h, size, mode=mode)

    out = inp if acc is None else inp + acc
    return depthwise_conv2d(out, conv_ws[level], conv_bs[level], stride=1, padding=pad)


def rec_conv2d_channel_split(
    x: jnp.ndarray,
    down_ws: tuple[jnp.ndarray, ...],   # level kernels, widths C/2, C/4, ...
    conv_ws: tuple[jnp.ndarray, ...],   # level+1 kernels, coarsest-first widths
    *,
    level: int,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """RecConv 'channel-split' alternate (documented dead code in the reference,
    /root/reference/model/recnext.py:511-541): at each level the channel dim is
    chunked in half — the first half is carried as a skip, the second half is
    downsampled — and the decode path upsamples + concatenates the skips back.

    conv_ws[0] applies at the coarsest level (width C/2^level)."""
    assert len(down_ws) == level and len(conv_ws) == level + 1
    k = int(down_ws[0].shape[0]) if level else int(conv_ws[0].shape[0])
    pad = k // 2

    skips: list[tuple[jnp.ndarray, tuple[int, int]]] = []
    for lvl in range(level):
        c = x.shape[-1]
        r, x2 = x[..., : c // 2], x[..., c // 2:]
        size = (int(x2.shape[1]), int(x2.shape[2]))
        x = depthwise_conv2d(x2, down_ws[lvl], stride=2, padding=pad)
        skips.append((r, size))

    for lvl, (r, size) in enumerate(reversed(skips)):
        h = depthwise_conv2d(x, conv_ws[lvl], stride=1, padding=pad)
        x = jnp.concatenate([r, resize(h, size, mode=mode)], axis=-1)
    return depthwise_conv2d(x, conv_ws[level], stride=1, padding=pad)


def rec_conv2d_transpose_up(
    x: jnp.ndarray,
    down_w: jnp.ndarray,
    conv_ws: tuple[jnp.ndarray, ...],
    up_w: jnp.ndarray,                  # (k+1, k+1, 1, C) depthwise transpose kernel
    *,
    level: int,
) -> jnp.ndarray:
    """RecConv alternate with a learned ConvTranspose2d upsample instead of bilinear
    (documented dead code, /root/reference/model/recnext.py:472-509 — 'only supports
    resolutions like 256, 384' i.e. power-of-two-divisible spatial sizes)."""
    assert len(conv_ws) == level + 1
    k = int(down_w.shape[0])
    pad = k // 2

    inp = x
    feats = []
    for _ in range(level):
        x = depthwise_conv2d(x, down_w, stride=2, padding=pad)
        feats.append(x)

    acc = None
    for lvl, f in enumerate(reversed(feats)):
        h = f if acc is None else f + acc
        h = depthwise_conv2d(h, conv_ws[lvl], stride=1, padding=pad)
        # torch ConvTranspose2d(stride=2, kernel=k+1, padding=k//2) doubles the size
        acc = _depthwise_conv_transpose2d(h, up_w, stride=2, padding=pad)
    out = inp if acc is None else inp + acc
    return depthwise_conv2d(out, conv_ws[level], stride=1, padding=pad)


def _depthwise_conv_transpose2d(x, w, *, stride=2, padding=2):
    """Depthwise ConvTranspose2d with torch semantics: out = (in-1)*s - 2p + k.
    Implemented as input dilation + regular depthwise conv with a flipped kernel."""
    k = int(w.shape[0])
    wf = w[::-1, ::-1]
    return lax.conv_general_dilated(
        x, jnp.asarray(wf, x.dtype),
        window_strides=(1, 1),
        padding=[(k - 1 - padding, k - 1 - padding)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=w.shape[-1],
    )
