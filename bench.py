"""Benchmark: fused-model inference throughput on one TPU chip.

Counterpart of /root/reference/speed_gpu.py:11-51 (warmup, then a timed loop, report
images/s on the BN-fused inference model). Baseline: reference RTX3090 fused
throughput for recnext_m1 = 384 img/s (/root/reference/upload.py:13, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINES = {  # RTX3090 fused img/s, /root/reference/upload.py:12-34
    "recnext_m0": 750, "recnext_m1": 384, "recnext_m2": 325, "recnext_m3": 314,
    "recnext_m4": 169, "recnext_m5": 104,
    "recnext_a0": 4891, "recnext_a1": 2730, "recnext_a2": 2331, "recnext_a3": 2151,
    "recnext_a4": 1265, "recnext_a5": 733,
    "recnext_t": 13878, "recnext_s": 7989, "recnext_b": 4450,
    "recnext_t_share_channel": 13957, "recnext_s_share_channel": 8034,
    "recnext_b_share_channel": 4472,
}


def throughput(model_name: str, batch: int, *, dtype=jnp.bfloat16,
               warmup_s: float = 5.0, timed_s: float = 10.0) -> float:
    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.registry import create_model

    model = create_model(model_name, dtype=dtype)
    x0 = jnp.zeros((1, 224, 224, 3), dtype)
    variables = model.init(jax.random.PRNGKey(0), x0)
    fused = create_model(model_name, fused=True, dtype=dtype)
    fvars = jax.device_put(fuse_params(variables))

    @jax.jit
    def fwd(v, x):
        return fused.apply(v, x, training=False)

    x = jnp.ones((batch, 224, 224, 3), dtype)
    # warmup (includes compile)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < warmup_s:
        jax.block_until_ready(fwd(fvars, x))
    # timed
    n = 0
    t0 = time.perf_counter()
    while (el := time.perf_counter() - t0) < timed_s:
        jax.block_until_ready(fwd(fvars, x))
        n += batch
    return n / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--timed", type=float, default=10.0)
    p.add_argument("--warmup", type=float, default=5.0)
    args = p.parse_args()

    ips = throughput(args.model, args.batch, warmup_s=args.warmup, timed_s=args.timed)
    base = BASELINES.get(args.model)
    print(json.dumps({
        "metric": f"{args.model}_fused_bf16_224_images_per_sec",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / base, 3) if base else None,
    }))


if __name__ == "__main__":
    main()
