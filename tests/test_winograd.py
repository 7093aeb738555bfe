"""Winograd depthwise conv: exact-matrix derivation for arbitrary F(m, r) and
output parity with the direct lax depthwise conv (SAME, stride 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recnext_tpu.ops.conv import depthwise_conv2d
from recnext_tpu.ops.winograd import dw_conv_winograd, winograd_matrices


@pytest.mark.parametrize("m,r", [(2, 3), (4, 3), (6, 3), (2, 5), (4, 5), (2, 7)])
def test_matrices_compute_valid_correlation(m, r):
    AT, G, BT = winograd_matrices(m, r)
    a = m + r - 1
    rng = np.random.default_rng(1)
    for _ in range(5):
        g = rng.normal(size=r)
        d = rng.normal(size=a)
        want = np.array([np.dot(g, d[k:k + r]) for k in range(m)])
        got = AT @ ((G @ g) * (BT @ d))
        np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("shape", [(2, 14, 14, 8), (1, 7, 9, 4), (3, 28, 28, 16),
                                   (1, 2, 2, 3)])
def test_dw_conv5x5_parity(shape, rng):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 1, shape[-1])).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(shape[-1],)).astype(np.float32))
    want = np.asarray(depthwise_conv2d(x, w, b, stride=1, padding=2))
    got = np.asarray(dw_conv_winograd(x, w, b))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_dw_conv3x3_and_f4(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 6)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(3, 3, 1, 6)).astype(np.float32))
    want = np.asarray(depthwise_conv2d(x, w3, None, stride=1, padding=1))
    got = np.asarray(dw_conv_winograd(x, w3, m=4))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_bf16_error_comparable_to_direct(rng):
    """bf16 Winograd must not be meaningfully less accurate than bf16 direct conv
    (both vs the fp32 direct reference)."""
    x32 = rng.normal(size=(2, 14, 14, 32)).astype(np.float32)
    w32 = rng.normal(size=(5, 5, 1, 32)).astype(np.float32)
    want = np.asarray(depthwise_conv2d(jnp.asarray(x32), jnp.asarray(w32),
                                       None, stride=1, padding=2))
    x16 = jnp.asarray(x32, jnp.bfloat16)
    w16 = jnp.asarray(w32, jnp.bfloat16)
    err_direct = np.max(np.abs(np.asarray(
        depthwise_conv2d(x16, w16, None, stride=1, padding=2),
        np.float32) - want))
    err_wino = np.max(np.abs(np.asarray(
        dw_conv_winograd(x16, w16), np.float32) - want))
    assert err_wino < 4 * err_direct + 1e-3
