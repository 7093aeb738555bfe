"""Micro-benchmarks of the hot ops on the real TPU: RecConv resize strategies,
linear-attention implementations (jnp kv-first / qk-first / Pallas kernel).

Usage: python -m recnext_tpu.benchmark.micro [--op recconv|attention|all]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, chain_idx=0, iters=50):
    """Per-op device time: chain `iters` dependent invocations inside ONE jitted
    lax.scan (output replaces args[chain_idx]) so remote-dispatch overhead (~2ms/call
    over the axon tunnel) is amortized away and XLA cannot CSE the iterations."""

    def step(carry, _):
        a = list(args)
        a[chain_idx] = carry
        out = fn(*a)
        return out.astype(carry.dtype), ()

    @jax.jit
    def run(x0):
        final, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    float(run(args[chain_idx]))  # warm/compile
    t0 = time.perf_counter()
    float(run(args[chain_idx]))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def bench_recconv(batch=256, dtype=jnp.bfloat16):
    from recnext_tpu.ops.conv import depthwise_conv2d
    from recnext_tpu.ops.recconv import rec_conv2d

    print("== RecConv2d stage shapes (M1 @224) ==", flush=True)
    for (h, c, level) in [(56, 48, 4), (14, 192, 2)]:
        x = jnp.ones((batch, h, h, c), dtype)
        dw = jnp.ones((5, 5, 1, c), dtype)
        cws = tuple(jnp.ones((5, 5, 1, c), dtype) for _ in range(level + 1))

        for up in ("gather", "matmul"):
            f = jax.jit(functools.partial(rec_conv2d, level=level, mode="bilinear",
                                          upsample=up))
            ms = timeit(f, x, dw, cws)
            print(f"  h={h} c={c} level={level} resize={up}: {ms:.3f} ms", flush=True)

        f = jax.jit(lambda x, w: depthwise_conv2d(x, w, stride=1, padding=2))
        ms = timeit(f, x, dw)
        print(f"  h={h} c={c} single dw5x5 (conv): {ms:.3f} ms", flush=True)


def bench_dwconv(batch=256, dtype=jnp.bfloat16):
    """conv_general_dilated vs tap-decomposed vs batch->lane folded depthwise."""
    from recnext_tpu.ops.conv import depthwise_conv2d, depthwise_conv2d_taps

    print("== depthwise 5x5 strategies ==", flush=True)
    for (h, c, stride) in [(56, 48, 1), (56, 48, 2), (28, 96, 1), (14, 192, 1)]:
        x = jnp.ones((batch, h, h, c), dtype)
        dw = jnp.ones((5, 5, 1, c), dtype)
        roof = 2 * batch * h * h * c * 2 / 819e9 * 1e3  # r+w bf16 ms at HBM peak

        f1 = jax.jit(lambda x, w: depthwise_conv2d(x, w, stride=stride, padding=2))
        f2 = jax.jit(lambda x, w: depthwise_conv2d_taps(x, w, stride=stride, padding=2))
        for name, f in [("conv", f1), ("taps", f2)]:
            if stride == 1:
                ms = timeit(f, x, dw, chain_idx=0)
            else:
                # stride-2 output shape differs; chain via a wrapper that resizes back
                g = jax.jit(lambda x, w: jnp.repeat(jnp.repeat(
                    f(x, w), 2, axis=1), 2, axis=2)[:, :h, :h])
                ms = timeit(g, x, dw, chain_idx=0)
            print(f"  h={h} c={c} s={stride} {name}: {ms:.3f} ms (roofline {roof:.3f})",
                  flush=True)

        # batch->lane folding: (B,H,W,C) -> (B/g,H,W,g*C)
        g_fold = max(1, 128 // c)
        if g_fold > 1 and batch % g_fold == 0:
            xf = x.reshape(batch // g_fold, g_fold, h, h, c)
            xf = jnp.moveaxis(xf, 1, -2).reshape(batch // g_fold, h, h, g_fold * c)
            dwf = jnp.tile(dw, (1, 1, 1, g_fold))
            f3 = jax.jit(lambda x, w: depthwise_conv2d(x, w, stride=stride, padding=2))
            if stride == 1:
                ms = timeit(f3, xf, dwf, chain_idx=0)
                print(f"  h={h} c={c} s={stride} conv folded x{g_fold}: {ms:.3f} ms",
                      flush=True)


def bench_stage2_packed(batch=256, dtype=jnp.bfloat16):
    """Round-3 item-1 decision measurement: the stage-2 RecConv formulations at
    the LANE-PACKED layout (m1 stage 2, g=2: (B/2, 14, 14, 384) — exact 3x128
    alignment) vs the unpacked shape. Candidates: XLA rec_conv2d (shipping),
    the fused Pallas pyramid kernel (ops/pallas/recconv.py, round-2 loser at
    192 lanes by relayout tax), and MXU-einsum Winograd F(2,5)
    (ops/winograd.py, round-2 loser by transform-contraction utilization)."""
    import functools as ft

    from recnext_tpu.ops.conv import depthwise_conv2d
    from recnext_tpu.ops.pallas.recconv import pallas_rec_conv2d
    from recnext_tpu.ops.recconv import rec_conv2d
    from recnext_tpu.ops.winograd import dw_conv_winograd

    print("== stage-2 RecConv formulations, packed vs unpacked ==", flush=True)
    for (b, c, tag) in [(batch, 192, "unpacked g=1"),
                        (batch // 2, 384, "packed   g=2")]:
        x = jnp.ones((b, 14, 14, c), dtype)
        dw = jnp.ones((5, 5, 1, c), dtype)
        cws = tuple(jnp.ones((5, 5, 1, c), dtype) for _ in range(3))

        f = jax.jit(ft.partial(rec_conv2d, level=2, mode="bilinear",
                               upsample="matmul"))
        ms = timeit(f, x, dw, cws)
        print(f"  {tag} (b={b},c={c}) XLA rec_conv2d: {ms:.3f} ms", flush=True)

        for bn in (4, 8, 16):
            try:
                f = ft.partial(pallas_rec_conv2d, level=2, block_n=bn)
                ms = timeit(f, x, dw, cws)
                print(f"  {tag} pallas fused (block_n={bn}): {ms:.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"  {tag} pallas fused (block_n={bn}): FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

        # single dw5x5 stride-1: direct vs MXU-einsum Winograd at this layout
        f = jax.jit(lambda x, w: depthwise_conv2d(x, w, stride=1, padding=2))
        ms = timeit(f, x, dw)
        print(f"  {tag} single dw5x5 direct: {ms:.3f} ms", flush=True)
        for m, name in [(2, "F(2,5)"), (4, "F(4,5)")]:
            f = jax.jit(ft.partial(dw_conv_winograd, m=m))
            ms = timeit(f, x, dw)
            print(f"  {tag} single dw5x5 winograd {name}: {ms:.3f} ms", flush=True)


def bench_attention(batch=256, dtype=jnp.bfloat16):
    from recnext_tpu.ops.attention import linear_attention_kv_first, linear_attention_qk_first
    from recnext_tpu.ops.pallas.linear_attention import pallas_linear_attention

    print("== Linear attention (A-series stage shapes, post stride-2) ==", flush=True)
    # (n, d, heads): stage0 28x28 d=24 h=2 (a1 dims)
    for (n, d, heads) in [(784, 24, 2), (49, 24, 8)]:
        bh = batch * heads
        q = jnp.ones((bh, n, d), dtype)
        k = jnp.ones((bh, n, d), dtype)
        v = jnp.ones((bh, n, d), dtype)
        for name, fn in [
            ("kv_first ", jax.jit(linear_attention_kv_first)),
            ("qk_first ", jax.jit(linear_attention_qk_first)),
            ("pallas   ", lambda q, k, v: pallas_linear_attention(q, k, v)),
        ]:
            try:
                ms = timeit(fn, q, k, v, chain_idx=2)
                print(f"  n={n} d={d} bh={bh} {name}: {ms:.3f} ms", flush=True)
            except Exception as e:
                print(f"  n={n} d={d} bh={bh} {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--op", default="all")
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    from recnext_tpu.utils.platform import honor_env_platform
    from recnext_tpu.utils.watchdog import require_devices

    honor_env_platform()
    require_devices(metric="micro_device_init")
    print("backend:", jax.default_backend(), jax.devices())
    if args.op in ("recconv", "all"):
        bench_recconv(args.batch)
    if args.op in ("attention", "all"):
        bench_attention(args.batch)
    if args.op in ("dwconv",):
        bench_dwconv(args.batch)
    if args.op in ("stage2-packed",):
        bench_stage2_packed(args.batch)
