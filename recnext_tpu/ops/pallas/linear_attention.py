"""Fused linear-attention Pallas TPU kernel.

Counterpart of the reference's one native kernel, the Triton `_attention_kernel`
(/root/reference/lsnet/model/triton.py:76-139): out = (q @ (k^T v)) * s^2 /
(q @ mean_n(k) + 1e-6). The Triton kernel streams N-tiles with an M-block accumulator
(good for a GPU's small SRAM); on TPU the whole (N, D) head fits VMEM, so the kernel
instead does the *kv-first* O(N d^2) contraction in one shot per (batch*head) grid
cell: two MXU matmuls + an fp32 normalizer, no HBM round-trips for the intermediates.
The normalizer stays fp32 (documented bf16 instability, /root/reference/README.md:676).

Numerics match the jnp references in recnext_tpu/ops/attention.py within 1e-3 (the
same tolerance the reference asserts Triton-vs-eager, triton.py:249-258).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_true: int, eps: float):
    q = q_ref[0]  # (Np, Dp)
    k = k_ref[0]
    v = v_ref[0]  # (Np, DVp)
    # kv = k^T v contracted over N (fp32 accumulation on the MXU)
    kv = jax.lax.dot_general(
        k, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Dp, DVp)
    ksum = jnp.sum(k.astype(jnp.float32), axis=0, keepdims=True)  # (1, Dp)
    denom = jax.lax.dot_general(
        q.astype(jnp.float32), ksum,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n_true + eps  # (Np, 1)
    num = jax.lax.dot_general(
        q, kv.astype(q.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, DVp)
    # s^2 = 1/n folds into the same 1/n as the mean: out = num / (n * denom)
    o_ref[0] = (num / (denom * n_true)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def pallas_linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k: (BH, N, D); v: (BH, N, DV) -> (BH, N, DV).

    Matches linear_attention_kv_first / _qk_first exactly (they are equivalent):
    out = q @ (k*s)^T(v*s) / (q @ mean_n(k) + eps), s = n^-0.5.
    """
    bh, n, d = q.shape
    dv = v.shape[-1]
    sub = 8 if q.dtype == jnp.float32 else 16
    np_, dp, dvp = _round_up(n, sub), _round_up(d, 128), _round_up(dv, 128)

    pad = lambda x, nn, dd: jnp.pad(x, ((0, 0), (0, nn - x.shape[1]), (0, dd - x.shape[2])))
    qp, kp, vp = pad(q, np_, dp), pad(k, np_, dp), pad(v, np_, dvp)

    out = pl.pallas_call(
        functools.partial(_kernel, n_true=n, eps=eps),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, dvp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, dvp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, dvp), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * np_ * dp * (dvp + 1) + 2 * bh * dp * dvp * np_,
            bytes_accessed=4 * bh * np_ * (2 * dp + 2 * dvp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :dv]
