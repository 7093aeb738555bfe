"""Winograd depthwise convolution for TPU — the stage-2 VPU-compute squeeze.

Motivation (PERF.md "Where m1's step goes"): RecNeXt's 5x5 depthwise convs are
VPU-compute-bound at 25 MACs/output; stage 2 (14x14x192) is 50% of the m1 step.
F(2,5) Winograd computes 2x2 outputs from a 6x6 tile with 36 elementwise
multiplies = 9 MACs/output — a 2.8x VPU reduction — while the tile/transform
algebra is folded into THREE dense matmuls per axis that ride the otherwise-idle
MXU (the same matmul-instead-of-gather trick that won for bilinear upsample,
ops/resize.py:resize_matmul).

Matrices are derived exactly (Fractions) for any F(m, r) via Cook-Toom on the
TRANSPOSED problem: a minimal algorithm for the full convolution of an m-vector
with the r-tap filter (polynomial interpolation at m+r-2 finite points + the
leading coefficient) transposes into a minimal algorithm for the m-output valid
correlation — Winograd's transposition principle. No hardcoded matrix tables.

Reference counterpart: none — the reference runs cuDNN's implicit-GEMM depthwise
path (/root/reference/model/recnext.py:16-23 nn.Conv2d(groups=C)); this module is
the TPU-native answer to the same hot op.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from typing import Tuple

import numpy as np

import jax.numpy as jnp

# interpolation points for the finite part (0, ±1, ±2, ±3, ... as needed)
_POINTS = [0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5]


@functools.lru_cache(maxsize=None)
def winograd_matrices(m: int, r: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(AT (m,a), G (a,r), BT (a,a)) with a = m+r-1 such that for d in R^a,
    g in R^r:  y_k = sum_i g_i d_{k+i}  ==  AT @ [(G @ g) * (BT @ d)]."""
    a = m + r - 1
    pts = [Fraction(p) for p in _POINTS[:a - 1]]

    # Full conv s = conv(g, e), e in R^m: s(x) = g(x) e(x), deg a-1.
    # Evaluations: s(p_j) for finite points + leading coeff s_{a-1}=g_{r-1}e_{m-1}.
    # V_g (a,r), V_e (a,m): Vandermonde rows + leading-coefficient row.
    def vand(n_coeffs):
        rows = [[p ** i for i in range(n_coeffs)] for p in pts]
        rows.append([Fraction(0)] * (n_coeffs - 1) + [Fraction(1)])
        return rows

    V_g = vand(r)
    V_e = vand(m)

    # Interpolation A_full (a,a): coefficients of s from the a evaluations.
    # s(x) = v_inf*N(x) + Lagrange(v_j - v_inf*N(p_j)), N monic of degree a-1.
    def poly_mul(p, q):
        out = [Fraction(0)] * (len(p) + len(q) - 1)
        for i, pi in enumerate(p):
            for j, qj in enumerate(q):
                out[i + j] += pi * qj
        return out

    N = [Fraction(1)]
    for p in pts:
        N = poly_mul(N, [-p, Fraction(1)])

    def poly_eval(c, x):
        acc = Fraction(0)
        for ci in reversed(c):
            acc = acc * x + ci
        return acc

    lagr = []  # coefficient vectors (deg <= a-2, padded to a)
    for j, pj in enumerate(pts):
        num = [Fraction(1)]
        den = Fraction(1)
        for k, pk in enumerate(pts):
            if k != j:
                num = poly_mul(num, [-pk, Fraction(1)])
                den *= pj - pk
        lagr.append([c / den for c in num] + [Fraction(0)] * (a - len(num)))

    A_full = [[Fraction(0)] * a for _ in range(a)]  # (a coeffs, a evals)
    for j in range(a - 1):
        for c in range(a):
            A_full[c][j] = lagr[j][c]
    for c in range(a):  # infinity column: N - sum_j N(p_j) * lagr_j
        A_full[c][a - 1] = N[c] - sum(poly_eval(N, pts[j]) * lagr[j][c]
                                      for j in range(a - 1))

    # Transposition principle: AT = V_e^T, G = V_g, BT = A_full^T
    AT = np.array([[float(V_e[j][k]) for j in range(a)] for k in range(m)])
    G = np.array([[float(x) for x in row] for row in V_g])
    BT = np.array([[float(A_full[c][j]) for c in range(a)] for j in range(a)])

    # Row-norm balancing: keep transform-domain values O(1) so the elementwise
    # product survives bf16 (unbalanced F(2,5) loses ~6 bits to dynamic range).
    # Diagonal scales commute through the elementwise product and fold into AT.
    sb = np.linalg.norm(BT, axis=1)
    sg = np.linalg.norm(G, axis=1)
    BT = BT / sb[:, None]
    G = G / sg[:, None]
    AT = AT * (sb * sg)[None, :]

    # exact-integer self check (cheap, cached)
    rng = np.random.default_rng(0)
    g = rng.integers(-3, 4, r).astype(np.float64)
    d = rng.integers(-3, 4, a).astype(np.float64)
    want = np.array([np.dot(g, d[k:k + r]) for k in range(m)])
    got = AT @ ((G @ g) * (BT @ d))
    assert np.allclose(got, want, atol=1e-8), (m, r, got, want)
    return AT, G, BT


@functools.lru_cache(maxsize=None)
def _axis_matrices(size: int, m: int, r: int):
    """Fold tile extraction + Winograd transform into dense matmuls along an axis.

    Returns (W_in (size+r-1, n_tiles*a), W_out (n_tiles*a, size)) so that for a
    padded axis vector xp (len size+r-1): (xp @ W_in) holds BT-transformed tiles
    and (t @ W_out) scatters AT-transformed tiles back to `size` outputs."""
    AT, G, BT = winograd_matrices(m, r)
    a = m + r - 1
    n_tiles = -(-size // m)  # ceil; needs padded length n_tiles*m + r - 1
    pad_len = n_tiles * m + r - 1
    W_in = np.zeros((pad_len, n_tiles * a), np.float32)
    for t in range(n_tiles):
        for u in range(a):
            for v in range(a):
                W_in[t * m + v, t * a + u] = BT[u, v]
    W_out = np.zeros((n_tiles * a, size), np.float32)
    for t in range(n_tiles):
        for k in range(m):
            o = t * m + k
            if o < size:
                for u in range(a):
                    W_out[t * a + u, o] = AT[k, u]
    return W_in, W_out, n_tiles, pad_len


def dw_conv_winograd(x: jnp.ndarray, w: jnp.ndarray, b=None, *, m: int = 2,
                     transform_dtype=jnp.float32) -> jnp.ndarray:
    """Depthwise stride-1 SAME conv via 2D Winograd F(m x m, r x r).

    x: (B, H, W, C) NHWC; w: (r, r, 1, C) depthwise HWIO (torch/XLA layout).
    Transforms AND the elementwise product run in transform_dtype (fp32 by
    default — the transform domain loses ~6 bits of bf16 dynamic range even
    after row-norm balancing, PERF.md round 2); only the output is cast back
    to x.dtype. Output matches lax depthwise conv SAME.
    """
    r = int(w.shape[0])
    B, H, W, C = x.shape
    pad = r // 2
    Wh_in, Wh_out, nth, ph = _axis_matrices(H, m, r)
    Ww_in, Ww_out, ntw, pw = _axis_matrices(W, m, r)
    a = m + r - 1

    _, G, _ = winograd_matrices(m, r)
    Gj = jnp.asarray(G, transform_dtype)
    # kernel transform: (r,r,C) -> (a,a,C); correlation needs no kernel flip
    k = w[:, :, 0, :].astype(transform_dtype)
    kt = jnp.einsum("ui,ijc,vj->uvc", Gj, k, Gj)

    xp = jnp.pad(x, ((0, 0), (pad, ph - H - pad), (pad, pw - W - pad), (0, 0)))
    # input transform along H then W (tile extraction folded into the matrices)
    xt = jnp.einsum("bhwc,hj->bjwc", xp.astype(transform_dtype),
                    jnp.asarray(Wh_in, transform_dtype),
                    preferred_element_type=jnp.float32)
    xt = jnp.einsum("bjwc,wk->bjkc", xt, jnp.asarray(Ww_in, transform_dtype),
                    preferred_element_type=jnp.float32)
    xt = xt.astype(transform_dtype)

    # elementwise product in the transform domain: (B, nth, a, ntw, a, C)*(a,a,C)
    xt = xt.reshape(B, nth, a, ntw, a, C)
    yt = xt * kt[None, None, :, None, :, :]
    yt = yt.reshape(B, nth * a, ntw * a, C)

    # output transform + scatter back to (H, W)
    y = jnp.einsum("bjkc,jh->bhkc", yt.astype(transform_dtype),
                   jnp.asarray(Wh_out, transform_dtype),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bhkc,kw->bhwc", y, jnp.asarray(Ww_out, transform_dtype),
                   preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
