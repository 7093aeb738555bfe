"""Fused RecConv2d Pallas TPU kernel (k=5, bilinear, bias-free — the M-series
config) — ONE dispatch for the whole pyramid instead of ~7 XLA ops.

Motivation (PERF.md stage breakdown): recnext_m1's stage 2 (15 RecConv-l2 blocks at
14x14x192) is 50% of the step and runs ~2x over its VPU compute bound — per-op
overhead at tiny spatial sizes. This kernel keeps every pyramid level in VMEM per
batch element.

Mosaic-friendly op vocabulary (all verified to lower):
* depthwise 5x5 stride-1 conv: 25 shifted multiply-adds (leading/sublane STATIC
  slices — strided slices are rejected by Mosaic, sublane-strided ones are 30x slow
  even in XLA);
* stride-2 along the LEADING axis: slice + reshape (out, 2, ...) + take [:, 0]
  (leading dims are untiled, so this is free);
* stride-2 / bilinear-resize along W: transpose (1,0,2) to put W on the leading axis
  (supported relayout), do the leading-axis trick, transpose back;
* bilinear upsample: per-output-row lerp of two leading rows + concat (PyTorch-exact
  align_corners=False plan precomputed at trace time).

Matches recnext_tpu.ops.recconv.rec_conv2d to float tolerance (interpret-mode tests)
and is benchmarked against the XLA path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recnext_tpu.ops.resize import _bilinear_axis_plan


def _lead_stride2(x, offset: int, out: int):
    """Rows offset, offset+2, ..., offset+2*(out-1) of axis 1 (x is (N, H, W, C))."""
    span = jax.lax.slice(
        x, (0, offset, 0, 0), (x.shape[0], offset + 2 * out) + x.shape[2:])
    return span.reshape(x.shape[0], out, 2, *x.shape[2:])[:, :, 0]


def _lead_lerp(x, plan):
    """Bilinear resize along axis 1 with a precomputed (idx0, idx1, w) plan."""
    idx0, idx1, w1 = plan
    rows = []
    for i0, i1, wv in zip(idx0.tolist(), idx1.tolist(), w1.tolist()):
        r0 = jax.lax.slice(x, (0, i0, 0, 0), (x.shape[0], i0 + 1) + x.shape[2:])
        if i1 == i0 or wv == 0.0:
            rows.append(r0)
        else:
            r1 = jax.lax.slice(x, (0, i1, 0, 0), (x.shape[0], i1 + 1) + x.shape[2:])
            rows.append(r0 + (r1 - r0) * jnp.asarray(wv, x.dtype))
    return jnp.concatenate(rows, axis=1)


def _swap_hw(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _conv_s1(x, w_ref, base: int, h: int, wd: int, k: int = 5):
    """Depthwise kxk stride-1 'same' conv on (N, h, wd, C)."""
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = None
    for dh in range(k):
        for dw in range(k):
            term = (xp[:, dh:dh + h, dw:dw + wd, :]
                    * w_ref[base + dh * k + dw][None, None, None, :])
            out = term if out is None else out + term
    return out


def _conv_s2(x, w_ref, base: int, h: int, wd: int, oh: int, ow: int, k: int = 5):
    """Depthwise kxk stride-2 conv (pad k//2) on (N, h, wd, C): H via the axis-1
    stride trick, W likewise after one transpose; accumulate in transposed space."""
    pad = k // 2
    extra_h = max(0, (k - 1) + 2 * oh - (h + 2 * pad))
    extra_w = max(0, (k - 1) + 2 * ow - (wd + 2 * pad))
    xp = jnp.pad(x, ((0, 0), (pad, pad + extra_h), (pad, pad + extra_w), (0, 0)))
    acc_t = None  # (N, ow, oh, C)
    for dh in range(k):
        rows = _lead_stride2(xp, dh, oh)  # (N, oh, wp, C)
        rt = _swap_hw(rows)               # (N, wp, oh, C)
        for dw in range(k):
            sel = _lead_stride2(rt, dw, ow)  # (N, ow, oh, C)
            term = sel * w_ref[base + dh * k + dw][None, None, None, :]
            acc_t = term if acc_t is None else acc_t + term
    return _swap_hw(acc_t)


def _resize_up(x, plan_h, plan_w):
    y = _lead_lerp(x, plan_h)
    return _swap_hw(_lead_lerp(_swap_hw(y), plan_w))


def _make_kernel(level: int, sizes, k: int = 5):
    plans = []
    for lvl in range(level):
        src = sizes[level - lvl]
        dst = sizes[level - 1 - lvl]
        plans.append((_bilinear_axis_plan(src[0], dst[0]),
                      _bilinear_axis_plan(src[1], dst[1])))

    def kernel(x_ref, down_ref, convs_ref, o_ref):
        # (N, H, W, C) block; compute in fp32 (XLA convs accumulate fp32 — matching
        # that keeps bf16 checkpoint parity at large magnitudes)
        x = x_ref[...].astype(jnp.float32)
        down = down_ref[...].astype(jnp.float32)
        convs = convs_ref[...].astype(jnp.float32)
        feats = []
        cur = x
        for i in range(level):
            h, wd = sizes[i]
            oh, ow = sizes[i + 1]
            cur = _conv_s2(cur, down, 0, h, wd, oh, ow, k)
            feats.append(cur)

        acc = None
        for lvl in range(level):
            f = feats[level - 1 - lvl]
            h, wd = sizes[level - lvl]
            src = f if acc is None else f + acc
            conv = _conv_s1(src, convs, lvl * k * k, h, wd, k)
            acc = _resize_up(conv, *plans[lvl])
        out = x if acc is None else x + acc
        o_ref[...] = _conv_s1(out, convs, level * k * k, sizes[0][0], sizes[0][1],
                              k).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("level", "interpret", "block_n"))
def pallas_rec_conv2d(
    x: jnp.ndarray,
    down_w: jnp.ndarray,               # (k, k, 1, C)
    conv_ws: tuple,                     # level+1 tensors of (k, k, 1, C)
    *,
    level: int,
    interpret: bool = False,
    block_n: int = 8,
) -> jnp.ndarray:
    """Fused RecConv2d forward. x NHWC; weights depthwise HWIO (bias-free).
    block_n images are processed per grid cell to amortize per-program overhead."""
    b, h, wd, c = x.shape
    k = int(down_w.shape[0])
    while b % block_n != 0:
        block_n //= 2
    sizes = [(h, wd)]
    for _ in range(level):
        sizes.append(((sizes[-1][0] + 1) // 2, (sizes[-1][1] + 1) // 2))

    down_flat = down_w.reshape(k * k, c).astype(x.dtype)
    convs_flat = jnp.concatenate(
        [w.reshape(k * k, c) for w in conv_ws], axis=0).astype(x.dtype)

    return pl.pallas_call(
        _make_kernel(level, sizes, k),
        grid=(b // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, h, wd, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        interpret=interpret,
    )(x, down_flat, convs_flat)
