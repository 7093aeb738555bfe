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
    "level,h,w,mode,kernel",
    [
        (1, 7, 7, "bilinear", 5),
        (2, 14, 14, "bilinear", 5),
        (3, 28, 28, "bilinear", 5),
        (4, 56, 56, "bilinear", 5),
        (2, 13, 17, "bilinear", 5),  # odd sizes stress ceil-div pyramid + size restore
        (3, 14, 14, "nearest", 5),
        # the ablation kernels (logs/ablation rec_3x3 / rec_7x7, RecConv2d
        # kernel_size param, model/recnext.py:9)
        (2, 14, 14, "bilinear", 3),
        (2, 14, 14, "nearest", 7),
    ],
)
def test_recconv_matches_reference(level, h, w, mode, kernel, rng):
    ref_mod = load_ref_module("model/recnext.py", "ref_recnext")
    c = 16
    torch.manual_seed(0)
    m = ref_mod.RecConv2d(c, kernel_size=kernel, bias=False, level=level, mode=mode).eval()
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


def test_depthwise_taps_backward_matches_conv_autodiff(rng):
    """The custom-vjp backward (taps decomposition, ops/conv.py:_dw_taps_grad_fn)
    is the conv-lowering autodiff's gradient reassociated: both must agree to
    float tolerance for input AND filter grads, at stride 1 and 2, above and
    below the shape-policy threshold."""
    import jax

    from recnext_tpu.ops import conv as conv_mod
    from recnext_tpu.ops.conv import conv2d, depthwise_conv2d

    conv_mod.DW_TAPS_VJP = True  # opt-in path (default off, PERF.md round 3)
    try:
        _run_taps_grad_parity(jax, conv2d, depthwise_conv2d, rng)
    finally:
        conv_mod.DW_TAPS_VJP = False


def _run_taps_grad_parity(jax, conv2d, depthwise_conv2d, rng):
    for (h, c, stride) in [(24, 32, 1), (24, 32, 2), (7, 48, 1)]:
        x = jnp.asarray(rng.normal(size=(3, h, h, c)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 5, 1, c)).astype(np.float32) * 0.2)

        def loss_custom(x, w):
            return jnp.sum(jnp.square(depthwise_conv2d(x, w, stride=stride,
                                                       padding=2)))

        def loss_plain(x, w):
            return jnp.sum(jnp.square(conv2d(x, w, stride=stride, padding=2,
                                             groups=c)))

        gx1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   atol=2e-3, rtol=2e-4)


def test_recconv_recurrent_matches_readme_oracle(rng):
    """rec_conv2d_recurrent vs the reference README's "RecConv Recurrent
    Aggregation" code block (/root/reference/README.md:489-521), extracted
    from the markdown and exec'd as the oracle."""
    import re

    from recnext_tpu.ops.recconv import rec_conv2d_recurrent

    md = open("/root/reference/README.md").read()
    sect = md.split("RecConv Recurrent Aggregation")[1]
    block = re.search(r"```python\n(.*?)```", sect, re.S).group(1)
    ns = {"torch": torch, "nn": torch.nn}
    exec(compile(block, "<readme-recurrent>", "exec"), ns)

    for level in (1, 2, 3):
        torch.manual_seed(7 + level)
        c = 24
        tm = ns["RecConv2d"](c, kernel_size=5, level=level, mode="nearest").eval()
        x_t = torch.randn(2, c, 32, 32)
        with torch.no_grad():
            want = tm(x_t).numpy()

        def oihw(t):
            return jnp.asarray(np.transpose(t.detach().numpy(), (2, 3, 1, 0)))

        got = rec_conv2d_recurrent(
            jnp.asarray(to_nhwc(x_t)), oihw(tm.n.weight), oihw(tm.b.weight),
            oihw(tm.c.weight), oihw(tm.d.weight),
            oihw(tm.a.weight) if tm.a is not None else None,
            level=level, mode="nearest")
        np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                                   want, atol=1e-4, rtol=1e-4)
