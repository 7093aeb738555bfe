"""Resize parity vs torch.nn.functional.interpolate (the parity-killer per SURVEY §7)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from recnext_tpu.ops.resize import resize_bilinear, resize_matmul, resize_nearest

SIZES = [
    (4, 7),  # odd upsample (stage-3 pyramid: 7 -> 4 -> 7)
    (7, 14),
    (14, 28),
    (28, 56),
    (2, 3),
    (1, 2),
    (5, 9),
    (8, 8),  # identity
    (16, 13),  # downsample (AlignResize-style paths)
]


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("in_s,out_s", SIZES)
def test_bilinear_matches_torch(in_s, out_s, rng):
    x = rng.standard_normal((2, in_s, in_s + 1, 5), dtype=np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(out_s, out_s + 2), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    got = _np(resize_bilinear(jnp.asarray(x), (out_s, out_s + 2)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_s,out_s", SIZES)
def test_nearest_matches_torch(in_s, out_s, rng):
    x = rng.standard_normal((2, in_s, in_s + 1, 5), dtype=np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(out_s, out_s + 2), mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    got = _np(resize_nearest(jnp.asarray(x), (out_s, out_s + 2)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_matmul_variant_matches_gather(mode, rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 5), dtype=np.float32))
    a = resize_matmul(x, (13, 18), mode=mode)
    if mode == "bilinear":
        b = resize_bilinear(x, (13, 18))
    else:
        b = resize_nearest(x, (13, 18))
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-5, rtol=1e-5)
