"""In-training eval-path benchmark: reference-style UNFUSED eval vs the fused
(+lane-packed) deployment-graph eval that train/main.py now uses by default.

The reference evaluates the raw model every epoch
(/root/reference/engine.py:78-109). BN-folding is a pure parameter transform
(fusion.py), so each eval epoch can instead run the deployment graph —
make_fused_eval_step traces fuse_params(xp=jnp) INTO the jitted step. This tool
measures both paths the tunnel-safe way (dependent iterations chained inside
one lax.scan, metrics fed back into the image so XLA cannot CSE or dead-code
the chain) and prints per-batch ms + the implied img/s.

  python -m recnext_tpu.benchmark.bench_eval --model recnext_m1 --batch 256
"""

from __future__ import annotations

import argparse
import json
import time


def bench_eval_step(eval_step, state, batch, iters: int = 30) -> float:
    """ms per eval step, chained: each iteration's image depends on the previous
    metrics (loss*1e-30 — numerically invisible, unfoldable)."""
    import jax
    import jax.numpy as jnp

    labels = batch["label"]

    def step(x, _):
        m = eval_step(state, {"image": x, "label": labels})
        dep = (m["loss_sum"].astype(jnp.float32) * 1e-30).astype(x.dtype)
        return x + dep, ()

    @jax.jit
    def run(x0):
        final, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    float(run(batch["image"]))  # compile + first exec
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(batch["image"]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main(argv=None):
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from recnext_tpu.models.registry import create_model, get_config
    from recnext_tpu.train.optim import make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_eval_step, make_fused_eval_step

    dtype = jnp.bfloat16
    cfg = get_config(args.model, num_classes=1000)
    model = create_model(args.model, dtype=dtype)
    x0 = jnp.zeros((1, args.image_size, args.image_size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: np.full(s.shape, 0.01, s.dtype), shapes)
    state = TrainState.create(variables, make_optimizer(1e-3))
    state = jax.device_put(state)

    batch = {
        "image": jax.device_put(
            jnp.ones((args.batch, args.image_size, args.image_size, 3), dtype)),
        "label": jax.device_put(
            jnp.arange(args.batch, dtype=jnp.int32) % cfg.num_classes),
    }

    unfused_ms = bench_eval_step(make_eval_step(model), state, batch,
                                 iters=args.iters)
    fused_model = None
    if cfg.family not in ("m", "a"):
        fused_model = create_model(args.model, num_classes=1000, fused=True,
                                   dtype=dtype)
    fused_ms = bench_eval_step(
        make_fused_eval_step(cfg, fused_model=fused_model, dtype=dtype),
        state, batch, iters=args.iters)

    print(json.dumps({
        "model": args.model, "batch": args.batch, "image_size": args.image_size,
        "unfused_eval_ms_per_batch": round(unfused_ms, 2),
        "fused_packed_eval_ms_per_batch": round(fused_ms, 2),
        "unfused_images_per_sec": round(args.batch / unfused_ms * 1e3, 1),
        "fused_packed_images_per_sec": round(args.batch / fused_ms * 1e3, 1),
        "speedup": round(unfused_ms / fused_ms, 3),
    }))


if __name__ == "__main__":
    main()
