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
