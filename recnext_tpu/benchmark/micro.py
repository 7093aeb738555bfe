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

    print("== RecConv2d stage shapes (M1 @224) ==")
    for (h, c, level) in [(56, 48, 4), (28, 96, 3), (14, 192, 2), (7, 384, 1)]:
        x = jnp.ones((batch, h, h, c), dtype)
        dw = jnp.ones((5, 5, 1, c), dtype)
        cws = tuple(jnp.ones((5, 5, 1, c), dtype) for _ in range(level + 1))

        for up in ("gather", "matmul"):
            f = jax.jit(functools.partial(rec_conv2d, level=level, mode="bilinear",
                                          upsample=up))
            ms = timeit(f, x, dw, cws)
            print(f"  h={h} c={c} level={level} resize={up}: {ms:.3f} ms")

        f = jax.jit(lambda x, w: depthwise_conv2d(x, w, stride=1, padding=2))
        ms = timeit(f, x, dw)
        print(f"  h={h} c={c} single dw5x5: {ms:.3f} ms")


def bench_attention(batch=256, dtype=jnp.bfloat16):
    from recnext_tpu.ops.attention import linear_attention_kv_first, linear_attention_qk_first
    from recnext_tpu.ops.pallas.linear_attention import pallas_linear_attention

    print("== Linear attention (A-series stage shapes, post stride-2) ==")
    # (n, d, heads): stage0 28x28 d=20 h=2 ... stage3 4x4 d=20 h=16 (a1 dims)
    for (n, d, heads) in [(784, 24, 2), (196, 24, 4), (49, 24, 8), (16, 24, 16)]:
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
                print(f"  n={n} d={d} bh={bh} {name}: {ms:.3f} ms")
            except Exception as e:
                print(f"  n={n} d={d} bh={bh} {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--op", default="all")
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if args.op in ("recconv", "all"):
        bench_recconv(args.batch)
    if args.op in ("attention", "all"):
        bench_attention(args.batch)
