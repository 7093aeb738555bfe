"""Golden tests for the documented RecConv alternates — the oracle is the reference's
own COMMENTED-OUT variant classes (/root/reference/model/recnext.py:472-541),
extracted from the source text and exec'd."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recnext_tpu.ops.recconv import rec_conv2d_channel_split, rec_conv2d_transpose_up
from tests.torch_ref import to_nhwc


def _load_commented_variant(marker: str):
    src = open("/root/reference/model/recnext.py").read()
    blocks = src.split("'''")
    for block in blocks:
        if marker in block:
            # the reference's Variant B block has a stray " ." typo line that is
            # not valid Python — drop such lines before exec
            block = "\n".join(l for l in block.splitlines()
                              if not l.strip().startswith("."))
            ns = {"torch": torch, "nn": torch.nn}
            exec(compile(block, "<variant>", "exec"), ns)
            return ns["RecConv2d"]
    raise AssertionError(f"variant block {marker!r} not found")


def _oihw(t):
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def test_channel_split_variant_matches_reference_comment():
    RecConv = _load_commented_variant("recursive decomposition on both spatial and channel")
    torch.manual_seed(0)
    c, level = 32, 2
    tm = RecConv(c, kernel_size=5, level=level).eval()

    x_t = torch.randn(2, c, 16, 16)
    with torch.no_grad():
        want = tm(x_t).numpy()

    down_ws = tuple(jnp.asarray(_oihw(d.weight)) for d in tm.downs)
    conv_ws = tuple(jnp.asarray(_oihw(cv.weight)) for cv in tm.convs)
    got = rec_conv2d_channel_split(jnp.asarray(to_nhwc(x_t)), down_ws, conv_ws,
                                   level=level)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=1e-4, rtol=1e-4)


def test_transpose_up_variant_matches_reference_comment():
    RecConv = _load_commented_variant("bilinear upsample can be replaced by convtranspose2d")
    torch.manual_seed(1)
    c, level = 16, 2
    tm = RecConv(c, kernel_size=5, level=level).eval()

    x_t = torch.randn(2, c, 16, 16)  # power-of-two sizes, as the comment requires
    with torch.no_grad():
        want = tm(x_t).numpy()

    down_w = jnp.asarray(_oihw(tm.down.weight))
    conv_ws = tuple(jnp.asarray(_oihw(cv.weight)) for cv in tm.convs)
    # ConvTranspose2d weight is (in, out/groups, kh, kw) = (C, 1, 6, 6)
    up_w = jnp.asarray(np.transpose(tm.up.weight.detach().numpy(), (2, 3, 1, 0)))
    got = rec_conv2d_transpose_up(jnp.asarray(to_nhwc(x_t)), down_w, conv_ws, up_w,
                                  level=level)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=1e-4, rtol=1e-4)


def test_maxpool_variant_matches_reference_comment():
    RecConv = _load_commented_variant("maxpool and maxunpool")
    torch.manual_seed(2)
    c, level = 24, 2
    tm = RecConv(c, kernel_size=5, level=level).eval()

    x_t = torch.randn(2, c, 16, 16)
    with torch.no_grad():
        want = tm(x_t).numpy()

    from recnext_tpu.ops.recconv import rec_conv2d_maxpool

    conv_ws = tuple(jnp.asarray(_oihw(cv.weight)) for cv in tm.convs)
    # reference iterates zip(self.convs, reversed(features)): convs[0] applies at
    # the coarsest level -> same ordering convention as ours
    got = rec_conv2d_maxpool(jnp.asarray(to_nhwc(x_t)), conv_ws, level=level)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=1e-4, rtol=1e-4)


def test_group_down_variant_a_matches_reference_comment():
    RecConv = _load_commented_variant("RecConv Variant A")
    torch.manual_seed(3)
    c, level = 32, 2
    tm = RecConv(c, kernel_size=5, level=level).eval()

    x_t = torch.randn(2, c, 16, 16)
    with torch.no_grad():
        want = tm(x_t).numpy()

    from recnext_tpu.ops.recconv import rec_conv2d_group_down

    down_ws = tuple(jnp.asarray(_oihw(d.weight)) for d in tm.downs)
    conv_ws = tuple(jnp.asarray(_oihw(cv.weight)) for cv in tm.convs)
    # ConvTranspose2d weight (in, out/groups, kh, kw) -> (kh, kw, out/groups, in)
    up_ws = tuple(jnp.asarray(np.transpose(u.weight.detach().numpy(), (2, 3, 1, 0)))
                  for u in tm.ups)
    got = rec_conv2d_group_down(jnp.asarray(to_nhwc(x_t)), down_ws, conv_ws, up_ws,
                                level=level)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=1e-4, rtol=1e-4)


def test_split_transpose_variant_b_matches_reference_comment():
    RecConv = _load_commented_variant("RecConv Variant B")
    torch.manual_seed(4)
    c, level = 32, 2
    tm = RecConv(c, kernel_size=5, level=level).eval()

    x_t = torch.randn(2, c, 16, 16)
    with torch.no_grad():
        want = tm(x_t).numpy()

    from recnext_tpu.ops.recconv import rec_conv2d_split_transpose_up

    down_ws = tuple(jnp.asarray(_oihw(d.weight)) for d in tm.downs)
    conv_ws = tuple(jnp.asarray(_oihw(cv.weight)) for cv in tm.convs)
    up_ws = tuple(jnp.asarray(np.transpose(u.weight.detach().numpy(), (2, 3, 1, 0)))
                  for u in tm.ups)
    got = rec_conv2d_split_transpose_up(jnp.asarray(to_nhwc(x_t)), down_ws, conv_ws,
                                        up_ws, level=level)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               atol=1e-4, rtol=1e-4)
