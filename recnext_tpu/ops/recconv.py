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

import jax
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


def rec_conv2d_maxpool(
    x: jnp.ndarray,
    conv_ws: tuple[jnp.ndarray, ...],   # level+1 depthwise kernels, coarsest-first
    *,
    level: int,
) -> jnp.ndarray:
    """RecConv 'maxpool/unpool' alternate (documented dead code in the reference,
    /root/reference/model/recnext.py:443-470): stride-2 max-pool downsample with
    argmax indices, max-unpool (scatter to the argmax position) upsample. Fewer
    params (no down kernel), 'higher gpu throughput ... but not coreml friendly'.

    TPU-first: the 2x2 pool/unpool pair is a reshape to (..., 2, 2, ...) windows +
    argmax one-hot — fixed shapes, no dynamic scatter. Requires even H/W at every
    level (the comment's power-of-two resolutions)."""
    assert len(conv_ws) == level + 1
    k = int(conv_ws[0].shape[0])
    pad = k // 2

    inp = x
    feats = []
    for _ in range(level):
        b, h, w_, c = x.shape
        win = x.reshape(b, h // 2, 2, w_ // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(b, h // 2, w_ // 2, 4, c)
        idx = jnp.argmax(win, axis=3)  # first max on ties, like torch
        x = jnp.max(win, axis=3)
        feats.append((x, idx, (h, w_)))

    acc = None
    for lvl, (f, idx, (h, w_)) in enumerate(reversed(feats)):
        y = f if acc is None else f + acc
        y = depthwise_conv2d(y, conv_ws[lvl], stride=1, padding=pad)
        hot = jax.nn.one_hot(idx, 4, dtype=y.dtype)      # (b, h/2, w/2, c, 4)
        hot = jnp.moveaxis(hot, -1, 3)                   # (b, h/2, w/2, 4, c)
        up = hot * y[:, :, :, None, :]
        b = y.shape[0]
        c = y.shape[-1]
        up = up.reshape(b, h // 2, w_ // 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        acc = up.reshape(b, h, w_, c)
    out = inp if acc is None else inp + acc
    return depthwise_conv2d(out, conv_ws[level], stride=1, padding=pad)


def _grouped_conv_transpose2d(x, w_ct, *, groups, stride=2, padding=2):
    """ConvTranspose2d with torch semantics for grouped kernels. w_ct is the torch
    layout (in, out_per_group, kh, kw) already transposed to (kh, kw, out_per_group,
    in); implemented as input dilation + regular conv with the flipped kernel."""
    kh = int(w_ct.shape[0])
    # equivalent forward kernel: flip spatial; (kh,kw,opg,in) -> HWIO (kh,kw,1?,out)
    opg = int(w_ct.shape[2])
    cin = int(w_ct.shape[3])
    wf = w_ct[::-1, ::-1]                                  # spatial flip
    # group-major output: group i (input channel block) -> out block i of size opg
    wf = wf.transpose(0, 1, 3, 2)                          # (kh,kw,in,opg)
    in_per_group = cin // groups
    wf = wf.reshape(kh, kh, groups, in_per_group, opg)
    wf = wf.transpose(0, 1, 3, 2, 4).reshape(kh, kh, in_per_group, groups * opg)
    return lax.conv_general_dilated(
        x, jnp.asarray(wf, x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def rec_conv2d_group_down(
    x: jnp.ndarray,
    down_ws: tuple[jnp.ndarray, ...],   # level kernels (k,k,2,C/2^(l+1)) HWIO
    conv_ws: tuple[jnp.ndarray, ...],   # level+1 depthwise kernels, coarsest-first
    up_ws: tuple[jnp.ndarray, ...],     # level CT kernels (k+1,k+1,2,C/2^(l+1)),
                                        # coarsest-first
    *,
    level: int,
) -> jnp.ndarray:
    """RecConv 'Variant A' (documented dead code, reference model/recnext.py
    "RecConv Variant A"): recursive decomposition on BOTH spatial and channel dims;
    stride-2 group convs halve channels on the way down, grouped ConvTranspose2d
    doubles them back on the way up."""
    assert len(conv_ws) == level + 1 and len(down_ws) == level == len(up_ws)
    k = int(conv_ws[0].shape[0])
    pad = k // 2

    inp = x
    feats = []
    for lvl in range(level):
        cout = down_ws[lvl].shape[-1]
        x = conv2d_grouped(x, down_ws[lvl], groups=cout, stride=2, padding=pad)
        feats.append(x)

    acc = None
    for lvl, f in enumerate(reversed(feats)):
        y = f if acc is None else f + acc
        y = depthwise_conv2d(y, conv_ws[lvl], stride=1, padding=pad)
        acc = _grouped_conv_transpose2d(y, up_ws[lvl], groups=y.shape[-1],
                                        stride=2, padding=pad)
    out = inp if acc is None else inp + acc
    return depthwise_conv2d(out, conv_ws[level], stride=1, padding=pad)


def rec_conv2d_split_transpose_up(
    x: jnp.ndarray,
    down_ws: tuple[jnp.ndarray, ...],   # level depthwise kernels, widths C/2^(l+1)
    conv_ws: tuple[jnp.ndarray, ...],   # level+1 depthwise kernels, coarsest-first
    up_ws: tuple[jnp.ndarray, ...],     # level depthwise CT kernels, coarsest-first
    *,
    level: int,
) -> jnp.ndarray:
    """RecConv 'Variant B' (documented dead code, reference model/recnext.py
    "RecConv Variant B"): channel-split skip + stride-2 depthwise downsample,
    depthwise ConvTranspose2d upsample + channel concat on the way back."""
    assert len(conv_ws) == level + 1 and len(down_ws) == level == len(up_ws)
    k = int(conv_ws[0].shape[0])
    pad = k // 2

    skips = []
    for lvl in range(level):
        c = x.shape[-1]
        r, x2 = x[..., : c // 2], x[..., c // 2:]
        x = depthwise_conv2d(x2, down_ws[lvl], stride=2, padding=pad)
        skips.append(r)

    for lvl, r in enumerate(reversed(skips)):
        y = depthwise_conv2d(x, conv_ws[lvl], stride=1, padding=pad)
        y = _depthwise_conv_transpose2d(y, up_ws[lvl], stride=2, padding=pad)
        x = jnp.concatenate([r, y], axis=-1)
    return depthwise_conv2d(x, conv_ws[level], stride=1, padding=pad)


def conv2d_grouped(x, w, *, groups, stride=1, padding=0):
    return lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


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


def rec_conv2d_recurrent(
    x: jnp.ndarray,
    n_w: jnp.ndarray,
    b_w: jnp.ndarray,
    c_w: jnp.ndarray,
    d_w: jnp.ndarray,
    a_w: jnp.ndarray | None = None,
    *,
    level: int = 1,
    mode: str = "nearest",
) -> jnp.ndarray:
    """RecConv "Recurrent Aggregation" README variant (reference:
    /root/reference/README.md "RecConv Recurrent Aggregation" code block).

    Unlike the main form's per-level kernels, this shares FIVE depthwise
    kernels across all levels: ``n`` (stride-2 downsample), ``a`` (applied to
    the running aggregate, level >= 2 only), ``b`` (per-level feature), and
    the final ``c``/``d`` pair:

        fs = [x] + [n applied repeatedly]
        h  = resize(b(fs[-1]));  h = resize(a(h) + b(f_i)) upward
        out = c(h) + d(x)

    All kernels HWIO (k, k, 1, C); x NHWC. The level loop is static/unrolled
    (level <= 4) so XLA sees straight-line depthwise convs + resizes.
    """
    if level > 1 and a_w is None:
        raise ValueError("a_w is required for level > 1")
    k = int(n_w.shape[0])
    pad = k // 2

    fs = [x]
    for _ in range(level):
        fs.append(depthwise_conv2d(fs[-1], n_w, stride=2, padding=pad))

    h = None
    for i, o in reversed(list(zip(fs[1:], fs[:-1]))):
        hb = depthwise_conv2d(i, b_w, stride=1, padding=pad)
        h = hb if h is None else depthwise_conv2d(h, a_w, stride=1, padding=pad) + hb
        h = resize(h, (int(o.shape[1]), int(o.shape[2])), mode=mode)
    return (depthwise_conv2d(h, c_w, stride=1, padding=pad)
            + depthwise_conv2d(x, d_w, stride=1, padding=pad))
