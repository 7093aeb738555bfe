"""Attention similarity + profiling harness — the counterpart of
/root/reference/lsnet/model/profile.py:140-278: compares linear-attention variants
(kv-first / qk-first, elu / softplus / relu feature maps) against the SDPA baseline
with MSE / MAE / cosine / max-diff metrics and an allclose verdict, plus device timing.

  python -m recnext_tpu.benchmark.profile_attn --resolution 16 --dim 256 --heads 4
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.ops.attention import (
    feature_map,
    linear_attention_kv_first,
    linear_attention_qk_first,
    softmax_attention,
)


def similarity(a: np.ndarray, b: np.ndarray) -> dict:
    a, b = a.astype(np.float64).ravel(), b.astype(np.float64).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    return {
        "mse": float(np.mean((a - b) ** 2)),
        "mae": float(np.mean(np.abs(a - b))),
        "cosine": cos,
        "max_diff": float(np.max(np.abs(a - b))),
        "allclose_1e-3": bool(np.allclose(a, b, atol=1e-3)),
    }


def main(argv=None):


    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=16)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--time", action="store_true", help="also device-time each variant")
    args = p.parse_args(argv)

    n = args.resolution ** 2
    d = args.dim // args.heads
    bh = args.batch * args.heads
    rng = np.random.default_rng(args.seed)
    x = rng.normal(size=(bh, n, d)).astype(np.float32)
    qk_raw = rng.normal(size=(bh, n, 2 * d)).astype(np.float32)

    v = jnp.asarray(x)
    results = {}
    sdpa = np.asarray(softmax_attention(
        jnp.asarray(qk_raw[..., :d]), jnp.asarray(qk_raw[..., d:]), v))
    for kind in ("elu", "softplus", "relu"):
        q = feature_map(jnp.asarray(qk_raw[..., :d]), kind)
        k = feature_map(jnp.asarray(qk_raw[..., d:]), kind)
        kv = np.asarray(linear_attention_kv_first(q, k, v))
        qkf = np.asarray(linear_attention_qk_first(q, k, v))
        results[f"kv_vs_qk[{kind}]"] = similarity(kv, qkf)
        results[f"linear[{kind}]_vs_sdpa"] = similarity(kv, sdpa)

    if args.time:
        from recnext_tpu.benchmark.micro import timeit

        q = feature_map(jnp.asarray(qk_raw[..., :d]), "elu")
        k = feature_map(jnp.asarray(qk_raw[..., d:]), "elu")
        for name, fn in [("kv_first", linear_attention_kv_first),
                         ("qk_first", linear_attention_qk_first),
                         ("sdpa", softmax_attention)]:
            results[f"time_ms[{name}]"] = round(
                timeit(jax.jit(fn), q, k, v, chain_idx=2), 4)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
