"""RecConv2d functional core vs the reference PyTorch RecConv2d module."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.ops.recconv import rec_conv2d
from tests.torch_ref import load_ref_module, to_nchw_tensor, to_nhwc


def _torch_dw_to_hwio(w: torch.Tensor) -> jnp.ndarray:
    # torch depthwise weight (C, 1, kh, kw) -> HWIO (kh, kw, 1, C)
    return jnp.asarray(w.detach().permute(2, 3, 1, 0).numpy())


@pytest.mark.parametrize(
    "level,h,w,mode",
    [
        (1, 7, 7, "bilinear"),
        (2, 14, 14, "bilinear"),
        (3, 28, 28, "bilinear"),
        (4, 56, 56, "bilinear"),
        (2, 13, 17, "bilinear"),  # odd sizes stress ceil-div pyramid + size restore
        (3, 14, 14, "nearest"),
    ],
)
def test_recconv_matches_reference(level, h, w, mode, rng):
    ref_mod = load_ref_module("model/recnext.py", "ref_recnext")
    c = 16
    torch.manual_seed(0)
    m = ref_mod.RecConv2d(c, kernel_size=5, bias=False, level=level, mode=mode).eval()
    # reference ctor leaves weights at conv default init; randomize for a stronger test
    # (std kept small so activations stay O(1) over level+1 chained convs and fp32
    # reduction-order noise does not dominate the comparison)
    for p in m.parameters():
        p.data.normal_(0, 0.15)

    x = rng.standard_normal((2, h, w, c), dtype=np.float32)
    with torch.no_grad():
        ref = to_nhwc(m(to_nchw_tensor(x)))

    down_w = _torch_dw_to_hwio(m.down.weight)
    conv_ws = tuple(_torch_dw_to_hwio(cv.weight) for cv in m.convs)
    got = np.asarray(rec_conv2d(jnp.asarray(x), down_w, conv_ws, level=level, mode=mode))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)
