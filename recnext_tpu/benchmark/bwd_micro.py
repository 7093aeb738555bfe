"""Per-op BACKWARD-cost micro-benchmark (round-3 train-step campaign).

The train-step breakdown (benchmark/train_breakdown.py) shows bwd-fwd at
~3.8x the forward for recnext_m1 — far above the ~2x a dense net costs. This
tool localizes that: for each hot op at every m1 stage shape it times the
forward, grad-wrt-input, grad-wrt-filter, and grad-both variants with the
scan-chained device timer (naive timing over the axon tunnel measures RTT,
not the device — PERF.md "measurement pitfalls").

Prime suspect: the depthwise-conv FILTER gradient, which XLA lowers as a
batch-grouped convolution (batch_group_count=C) — a shape class TPU handles
badly at small spatial sizes. The taps decomposition (ops/conv.py:
depthwise_conv2d_taps) autodiffs to k*k shifted multiply-reduces instead,
which is the VPU-native formulation of the same contraction.

Usage: python -m recnext_tpu.benchmark.bwd_micro [--batch 256] [--op all]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def _chain_time(step, carry0, iters=30):
    @jax.jit
    def run(c):
        final, _ = jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=iters)
        return jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), final)

    r = run(carry0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(run(carry0))
    return (time.perf_counter() - t0) / iters * 1e3


def time_modes(fn, x, w, iters=30):
    """ms/iter for fwd / grad-input / grad-filter / grad-both of y = fn(x, w).

    fn must be shape-preserving in x. Grad timings include the forward (VJP
    recomputes it); the analysis subtracts. The loss is mean(y) in fp32 so the
    chained carries stay finite in bf16.
    """

    def loss(x, w):
        # mean of SQUARES, not mean: a plain mean feeds the backward a constant
        # cotangent that XLA can algebraically collapse (sum-of-shifts of a
        # constant), making taps-style filter grads look ~4x cheaper than they
        # are with real cotangents. Squaring makes dy depend on y elementwise.
        return jnp.mean(jnp.square(fn(x, w).astype(jnp.float32)))

    def _sub(t, g):
        return jax.tree.map(lambda a, b: a - b.astype(a.dtype), t, g)

    out = {}
    out["fwd"] = _chain_time(lambda c: fn(c, w).astype(x.dtype), x, iters)
    gx = jax.grad(loss, argnums=0)
    out["dx"] = _chain_time(lambda c: (c - gx(c, w).astype(c.dtype)), x, iters)
    gw = jax.grad(loss, argnums=1)
    out["dw"] = _chain_time(lambda c: _sub(c, gw(x, c)), w, iters)
    gboth = jax.grad(loss, argnums=(0, 1))
    def both(c):
        dx, dw = gboth(c, w)
        leaves = [jnp.mean(l.astype(jnp.float32)) for l in jax.tree.leaves(dw)]
        return c - dx.astype(c.dtype) - sum(leaves).astype(c.dtype)
    out["both"] = _chain_time(both, x, iters)
    return out


M1_STAGES = [(56, 48), (28, 96), (14, 192), (7, 384)]


def bench_dw_bwd(batch=256, dtype=jnp.bfloat16, kernel=5, stride=1):
    from recnext_tpu.ops.conv import conv2d, depthwise_conv2d_taps

    print(f"== depthwise {kernel}x{kernel} s{stride} bwd, conv lowering vs taps "
          "decomposition ==", flush=True)
    pad = kernel // 2
    for h, c in M1_STAGES:
        x = jnp.ones((batch, h, h, c), dtype)
        w = jnp.full((kernel, kernel, 1, c), 0.04, dtype)
        for name, f in [
            # plain conv lowering fwd+bwd (NOT depthwise_conv2d, which now
            # carries the custom taps vjp)
            ("conv", lambda x, w: conv2d(x, w, stride=stride, padding=pad,
                                         groups=w.shape[-1])),
            ("taps", lambda x, w: depthwise_conv2d_taps(x, w, stride=stride,
                                                        padding=pad)),
        ]:
            if stride == 1:
                r = time_modes(f, x, w)
                print(f"  ({h}^2,{c}) {name}: fwd {r['fwd']:.3f}  dx {r['dx']:.3f}"
                      f"  dw {r['dw']:.3f}  both {r['both']:.3f} ms", flush=True)
            else:
                # shape changes under stride: only the filter grad (chained on
                # w, shape-preserving) can ride the scan timer
                def loss(x, w, f=f):
                    return jnp.mean(jnp.square(f(x, w).astype(jnp.float32)))
                gw = jax.grad(loss, argnums=1)
                ms = _chain_time(lambda c: c - gw(x, c).astype(c.dtype), w)
                print(f"  ({h}^2,{c}) {name}: dw {ms:.3f} ms", flush=True)


def bench_recconv_bwd(batch=256, dtype=jnp.bfloat16):
    from recnext_tpu.ops.recconv import rec_conv2d

    print("== RecConv2d bwd (matmul upsample, shipping config) ==", flush=True)
    for (h, c, level) in [(56, 48, 4), (28, 96, 3), (14, 192, 2), (7, 384, 1)]:
        x = jnp.ones((batch, h, h, c), dtype)
        dw = jnp.full((5, 5, 1, c), 0.04, dtype)
        cws = tuple(jnp.full((5, 5, 1, c), 0.04, dtype) for _ in range(level + 1))

        def f(x, ws):
            return rec_conv2d(x, ws[0], tuple(ws[1:]), level=level,
                              mode="bilinear", upsample="matmul")

        ws = (dw,) + cws
        r = time_modes(f, x, ws)
        print(f"  ({h}^2,{c}) level={level}: fwd {r['fwd']:.3f}  dx {r['dx']:.3f}"
              f"  dw {r['dw']:.3f}  both {r['both']:.3f} ms", flush=True)


def bench_mlp_bn_bwd(batch=256, dtype=jnp.bfloat16):
    print("== 1x1 mlp + train-mode BN bwd ==", flush=True)
    from recnext_tpu.ops.conv import conv2d

    for h, c in M1_STAGES:
        x = jnp.ones((batch, h, h, c), dtype)
        w = (jnp.full((1, 1, c, 2 * c), 0.02, dtype),
             jnp.full((1, 1, 2 * c, c), 0.02, dtype))

        def mlp(x, w):
            return conv2d(jax.nn.gelu(conv2d(x, w[0])), w[1])

        r = time_modes(mlp, x, w)
        print(f"  ({h}^2,{c}) mlp x2: fwd {r['fwd']:.3f}  dx {r['dx']:.3f}"
              f"  dw {r['dw']:.3f}  both {r['both']:.3f} ms", flush=True)

        g = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))

        def bn(x, g):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mu), axis=(0, 1, 2))
            y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * g[0] + g[1]
            return y.astype(x.dtype)

        r = time_modes(bn, x, g)
        print(f"  ({h}^2,{c}) BN train: fwd {r['fwd']:.3f}  dx {r['dx']:.3f}"
              f"  dw {r['dw']:.3f}  both {r['both']:.3f} ms", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--kernel", type=int, default=5)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--op", default="all", choices=["dw", "recconv", "mlpbn", "all"])
    args = p.parse_args()

    from recnext_tpu.utils.platform import honor_env_platform
    from recnext_tpu.utils.watchdog import require_devices

    honor_env_platform()
    require_devices(metric="bwd_micro_device_init")
    if args.op in ("dw", "all"):
        bench_dw_bwd(args.batch, kernel=args.kernel, stride=args.stride)
    if args.op in ("recconv", "all"):
        bench_recconv_bwd(args.batch)
    if args.op in ("mlpbn", "all"):
        bench_mlp_bn_bwd(args.batch)
