"""Op-level breakdown INSIDE the A-family RecAttn2d block, at the shipping
packed shapes — the round-5 a-family utilization campaign (VERDICT r4 item 1:
the family ran at 52-69% of its compute roofline with the gap asserted, not
demonstrated; this CLI measures it op by op and measures the candidate levers).

Components timed per stage (batch folded to the measured packing policy):
  down       stride-2 depthwise 5x5 into the attention pyramid
  qk_conv    the grouped 1x1 q/k projection (MXU)
  qk+elu     projection + feature map (XLA epilogue-fusion check)
  split      the head split/merge 6-D transposes ALONE (relayout tax)
  la_head    shipping head-batched linear attention (split + einsums + merge)
  la_blkdiag blockdiag NHWC-layout linear attention (no transposes)
  la_blk_fus blockdiag + normalizer fused into the kv matmul column
  pe_conv    depthwise 3x3 positional term
  resize_g   nearest x2 upsample, gather formulation (shipping)
  resize_m   nearest x2 upsample, MXU-einsum formulation
  out_conv   depthwise 5x5 over x + up(attn)
  mlp        the block's grouped 1x1 mlp + GELU
  block      the whole packed A block (sum-check: block - sum(parts) =
             fusion/overlap credit or inter-op tax)
  block_blk  the whole block with attn_impl='blockdiag'

Timing: micro.timeit's scan-chained device pattern with an explicitly
measured dispatch floor subtracted (these ops are 10-100 us; the per-run
tunnel RTT would otherwise dominate, PERF.md "measurement pitfalls").

  JAX_PLATFORMS=... python -m recnext_tpu.benchmark.attn_breakdown \
      --model recnext_a0 --stages 1 2 --out attn_breakdown_a0.json
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def timeit_floor(fn, *args, chain_idx=0, iters=400):
    """micro.timeit with an explicit dispatch-floor subtraction: the same
    dispatch+drain on a trivial computation is timed and removed, so 10 us ops
    measure honestly over the high-RTT tunnel."""

    def step(carry, _):
        a = list(args)
        a[chain_idx] = carry
        out = fn(*a)
        return out.astype(carry.dtype) if out.shape == carry.shape else \
            carry + 0.0 * jnp.sum(out).astype(carry.dtype), ()

    @jax.jit
    def run(x0):
        final, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    @jax.jit
    def noop(x0):
        return jnp.sum(x0.astype(jnp.float32))

    x0 = args[chain_idx]
    float(noop(x0))
    floor = min(_t(lambda: float(noop(x0))) for _ in range(3))
    float(run(x0))  # compile
    wall = min(_t(lambda: float(run(x0))) for _ in range(2))
    return max(wall - floor, 0.0) / iters * 1e3  # ms


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def stage_shapes(model: str, batch: int):
    """[(stage, packed_batch, H, packed_C, heads, g)] under the shipping
    packing policy."""
    from recnext_tpu.models.packed_infer import default_groups
    from recnext_tpu.models.registry import get_config

    cfg = get_config(model)
    assert cfg.family == "a", "attn_breakdown targets the A family"
    gs = default_groups(cfg, batch)
    out = []
    for i, c in enumerate(cfg.embed_dim):
        g = gs[i]
        out.append((i, batch // g, 56 // (2 ** i), c * g, 2 ** (i + 1), g))
    return cfg, out


def breakdown_stage(model: str, stage: int, batch: int, dtype=jnp.bfloat16,
                    iters: int = 400) -> dict:
    from recnext_tpu.models.packed_infer import _packed_linear_attention
    from recnext_tpu.ops.attention import (
        feature_map,
        linear_attention_blockdiag,
    )
    from recnext_tpu.ops.conv import conv2d
    from recnext_tpu.models.layers import gelu
    from recnext_tpu.ops.resize import resize, resize_matmul

    cfg, shapes = stage_shapes(model, batch)
    i, b, hh, cg, heads, g = shapes[stage]
    c_img = cg // g  # per-image channels
    hd = c_img // heads
    k = cfg.recattn_kernel_size if hasattr(cfg, "recattn_kernel_size") else 5
    mlpc = int(c_img * cfg.mlp_ratio[i]) * g

    x = jnp.ones((b, hh, hh, cg), dtype)
    yd = jnp.ones((b, hh // 2, hh // 2, cg), dtype)
    qk = jnp.ones((b, hh // 2, hh // 2, 2 * cg), dtype)
    dw5 = jnp.ones((k, k, 1, cg), dtype)
    dw3 = jnp.ones((3, 3, 1, cg), dtype)
    wqk = jnp.ones((1, 1, c_img // 2, 2 * cg), dtype)   # groups=2g
    bqk = jnp.zeros((2 * cg,), dtype)
    w1 = jnp.ones((1, 1, c_img, mlpc), dtype)           # groups=g
    w2 = jnp.ones((1, 1, mlpc // g, cg), dtype)
    variant = 2 if i >= 3 else 1

    def split_merge(qk_, v_):
        # the 6-D relayout of _packed_linear_attention with the einsums elided
        b_, h_, w_, _ = qk_.shape
        n = h_ * w_
        z = qk_.reshape(b_, n, g, 2, heads, hd)
        z = jnp.transpose(z, (3, 0, 2, 4, 1, 5))
        vh = v_.reshape(b_, n, g, heads, hd)
        vh = jnp.transpose(vh, (0, 2, 3, 1, 4)).reshape(b_ * g * heads, n, hd)
        o = vh + jnp.sum(z[0].reshape(b_ * g * heads, n, hd) * 0, -1, keepdims=True)
        o = o.reshape(b_, g, heads, n, hd)
        return jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(b_, h_, w_, g * c_img)

    def whole_block(x_, attn):
        ydl = conv2d(x_, dw5, None, stride=2, padding=k // 2, groups=cg)
        qkl = feature_map(conv2d(ydl, wqk, bqk, groups=2 * g), cfg.attn_kernel)
        if attn == "headbatch":
            o = _packed_linear_attention(qkl, ydl, g, heads, hd, variant=variant)
        else:
            o = linear_attention_blockdiag(qkl, ydl, heads, groups=g)
        o = o + conv2d(ydl, dw3, None, padding=1, groups=cg)
        o = resize(o, (x_.shape[1], x_.shape[2]), mode="nearest")
        y = conv2d(x_ + o, dw5, None, padding=k // 2, groups=cg)
        h = gelu(conv2d(y, w1, None, groups=g))
        y = conv2d(h, w2, None, groups=g)
        return x_ + y

    t = functools.partial(timeit_floor, iters=iters)
    parts = {
        "down": t(jax.jit(lambda x_: conv2d(x_, dw5, None, stride=2,
                                            padding=k // 2, groups=cg)), x),
        "qk_conv": t(jax.jit(lambda y_: conv2d(y_, wqk, bqk, groups=2 * g)), yd),
        "qk_elu": t(jax.jit(lambda y_: feature_map(
            conv2d(y_, wqk, bqk, groups=2 * g), cfg.attn_kernel)), yd),
        "split": t(jax.jit(split_merge), qk, yd, chain_idx=1),
        "la_head": t(jax.jit(lambda q_, v_: _packed_linear_attention(
            q_, v_, g, heads, hd, variant=variant)), qk, yd, chain_idx=1),
        "la_blkdiag": t(jax.jit(lambda q_, v_: linear_attention_blockdiag(
            q_, v_, heads, groups=g)), qk, yd, chain_idx=1),
        "la_blk_fus": t(jax.jit(lambda q_, v_: linear_attention_blockdiag(
            q_, v_, heads, groups=g, fused_denom=True)), qk, yd, chain_idx=1),
        "pe_conv": t(jax.jit(lambda y_: conv2d(y_, dw3, None, padding=1,
                                               groups=cg)), yd),
        "resize_g": t(jax.jit(lambda y_: resize(y_, (hh, hh), mode="nearest")), yd),
        "resize_m": t(jax.jit(lambda y_: resize_matmul(y_, (hh, hh),
                                                       mode="nearest")), yd),
        "out_conv": t(jax.jit(lambda x_: conv2d(x_, dw5, None, padding=k // 2,
                                                groups=cg)), x),
        "mlp": t(jax.jit(lambda x_: conv2d(gelu(conv2d(x_, w1, None, groups=g)),
                                           w2, None, groups=g)), x),
        "block": t(jax.jit(lambda x_: whole_block(x_, "headbatch")), x),
        "block_blk": t(jax.jit(lambda x_: whole_block(x_, "blockdiag")), x),
    }
    comp_sum = (parts["down"] + parts["qk_elu"] + parts["la_head"]
                + parts["pe_conv"] + parts["resize_g"] + parts["out_conv"]
                + parts["mlp"])
    return {"model": model, "stage": i, "batch_packed": b, "h": hh,
            "c_packed": cg, "heads": heads, "g": g, "variant": variant,
            "ms": {n: round(v, 5) for n, v in parts.items()},
            "sum_parts_ms": round(comp_sum, 5),
            "inter_op_tax_ms": round(parts["block"] - comp_sum, 5)}


def main(argv=None):
    from recnext_tpu.utils.platform import honor_env_platform
    from recnext_tpu.utils.watchdog import require_devices
    from recnext_tpu.utils.cache import enable_compile_cache

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_a0")
    p.add_argument("--stages", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--compile-cache", default="")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    enable_compile_cache(args.compile_cache or None)
    require_devices(metric="attn_breakdown_device_init")

    rows = []
    for s in args.stages:
        row = breakdown_stage(args.model, s, args.batch, iters=args.iters)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            Path(args.out).write_text(json.dumps(rows, indent=2))
    return rows


if __name__ == "__main__":
    main()
