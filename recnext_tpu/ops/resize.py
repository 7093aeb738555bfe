"""Spatial resize ops with exact PyTorch `F.interpolate` semantics, NHWC layout.

The RecConv pyramid upsamples each level back to the spatial size recorded before its
stride-2 downsample (reference: /root/reference/model/recnext.py:24-34), and RecAttn2d
upsamples with mode="nearest" (reference: /root/reference/model/recattn.py:54-67).
Matching PyTorch's resampling conventions bit-for-bit is required for checkpoint parity:

* bilinear, align_corners=False: source coordinate ``max(scale*(i+0.5)-0.5, 0)`` with
  linear weights and edge clamping (ATen upsample_bilinear2d).
* nearest (NOT nearest-exact): source index ``floor(i * in_size / out_size)`` — an
  asymmetric convention that differs from ``jax.image.resize``'s half-pixel "nearest".

Because all shapes are static under jit, the gather indices and lerp weights are
precomputed with numpy at trace time; at runtime a resize is just 2 gathers + a lerp
per axis (bilinear) or 2 gathers (nearest) — cheap VPU work that XLA fuses into
neighbouring ops. A dense-matrix variant (interpolation expressed as two small matmuls
that run on the MXU) is provided for cases where gathers are the bottleneck.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_axis_plan(in_size: int, out_size: int) -> tuple:
    """(idx0, idx1, w1) so out[i] = x[idx0[i]]*(1-w1[i]) + x[idx1[i]]*w1[i]."""
    scale = in_size / out_size
    src = scale * (np.arange(out_size, dtype=np.float64) + 0.5) - 0.5
    src = np.maximum(src, 0.0)
    idx0 = np.floor(src).astype(np.int32)
    idx0 = np.minimum(idx0, in_size - 1)
    idx1 = np.minimum(idx0 + 1, in_size - 1)
    w1 = (src - idx0).astype(np.float32)
    return idx0, idx1, w1


@functools.lru_cache(maxsize=None)
def _nearest_axis_plan(in_size: int, out_size: int) -> np.ndarray:
    """PyTorch 'nearest' source indices: floor(i * in / out) via exact int math."""
    i = np.arange(out_size, dtype=np.int64)
    return ((i * in_size) // out_size).astype(np.int32)


def _lerp_axis(x: jnp.ndarray, axis: int, plan) -> jnp.ndarray:
    idx0, idx1, w1 = plan
    if np.all(w1 == 0.0) and np.array_equal(idx0, idx1):
        return jnp.take(x, jnp.asarray(idx0), axis=axis)
    x0 = jnp.take(x, jnp.asarray(idx0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(idx1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = jnp.asarray(w1, dtype=x.dtype).reshape(shape)
    return x0 + (x1 - x0) * w


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, align_corners=False, PyTorch-exact."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = _lerp_axis(x, 1, _bilinear_axis_plan(h, oh))
    if w != ow:
        x = _lerp_axis(x, 2, _bilinear_axis_plan(w, ow))
    return x


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """NHWC nearest resize with PyTorch's asymmetric floor(i*in/out) convention."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = jnp.take(x, jnp.asarray(_nearest_axis_plan(h, oh)), axis=1)
    if w != ow:
        x = jnp.take(x, jnp.asarray(_nearest_axis_plan(w, ow)), axis=2)
    return x


def resize(x: jnp.ndarray, size: tuple[int, int], mode: str = "bilinear") -> jnp.ndarray:
    if mode == "bilinear":
        return resize_bilinear(x, size)
    if mode == "nearest":
        return resize_nearest(x, size)
    raise ValueError(f"unsupported resize mode: {mode}")


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix — resize as an MXU matmul."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if mode == "bilinear":
        idx0, idx1, w1 = _bilinear_axis_plan(in_size, out_size)
        rows = np.arange(out_size)
        np.add.at(m, (rows, idx0), 1.0 - w1)
        np.add.at(m, (rows, idx1), w1)
    elif mode == "nearest":
        idx = _nearest_axis_plan(in_size, out_size)
        m[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(mode)
    return m


def resize_matmul(x: jnp.ndarray, size: tuple[int, int], mode: str = "bilinear") -> jnp.ndarray:
    """Resize expressed as two small dense matmuls (runs on the MXU)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    if h != oh:
        rh = jnp.asarray(_resize_matrix(h, oh, mode), dtype=dt)
        x = jnp.einsum("oh,bhwc->bowc", rh, x)
    if w != ow:
        rw = jnp.asarray(_resize_matrix(w, ow, mode), dtype=dt)
        x = jnp.einsum("ow,bhwc->bhoc", rw, x)
    return x
