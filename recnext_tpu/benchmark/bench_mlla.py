"""MLLA-family throughput on TPU — completes per-family bench coverage.

The reference's MLLA section publishes accuracy only (/root/reference/README.md:
660-670); these are the first throughput numbers for the graft family. Same
measurement discipline as bench.py (chained dependent steps, single drain —
naive per-call timing over the axon tunnel measures RTT, PERF.md). MLLA has no
published fused form, so this times the eval-mode model as-is (BN in inference
mode), bf16.

  python -m recnext_tpu.benchmark.bench_mlla --models mlla_nano_recattn_simple
"""

from __future__ import annotations

import argparse
import json
import time


def throughput(name: str, batch: int, *, timed_s: float = 6.0,
               image_size: int = 0, attn_impl: str = "headbatch") -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from recnext_tpu.models.mlla import create_mlla

    dtype = jnp.bfloat16
    model = create_mlla(name, dtype=dtype, attn_impl=attn_impl)
    # MLLA is a 256-input family (MLLAConfig.img_size; the recattn grafts
    # require EVEN stage sizes — 224 ends stage 3 at 7x7 and the stride-2
    # attention's x2 nearest upsample cannot add back to it, in the reference
    # torch code as much as here). 0 = the config's native size.
    image_size = image_size or model.cfg.img_size
    x0 = jnp.zeros((1, image_size, image_size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.device_put(
        jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes))

    @jax.jit
    def step(v, x):
        y = model.apply(v, x, training=False)
        return x + (0.0 * jnp.sum(y)).astype(x.dtype)

    def sync(xx):
        return float(jnp.sum(xx[0, 0, 0]))

    x = jnp.ones((batch, image_size, image_size, 3), dtype)
    x = step(variables, x)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(3):
        x = step(variables, x)
        sync(x)
    est = (time.perf_counter() - t0) / 3
    iters = max(3, min(2000, int(timed_s / max(est, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(variables, x)
    sync(x)
    return iters * batch / (time.perf_counter() - t0)


def train_throughput(name: str, batch: int, *, timed_s: float = 6.0,
                     image_size: int = 0, mesa: float = 0.0,
                     attn_impl: str = "headbatch") -> float:
    """Full MLLA-recipe train step on one chip: fwd+bwd+AdamW(norm clip 5.0)+
    EMA+mixup, optionally with the MESA EMA-teacher forward active (mesa > 0 =
    the recipe's second phase, AUG.MESA 1.0 — adds an inference forward over
    the EMA weights inside the same compiled step)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from recnext_tpu.models.mlla import create_mlla
    from recnext_tpu.train.optim import cosine_schedule, make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_train_step

    dtype = jnp.bfloat16
    model = create_mlla(name, dtype=dtype, attn_impl=attn_impl)
    image_size = image_size or model.cfg.img_size
    x0 = jnp.zeros((1, image_size, image_size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: (np.ones(s.shape, s.dtype) * 0.01), shapes)
    tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.05,
                        agc_clip=5.0, clip_mode="norm")
    state = jax.device_put(TrainState.create(variables, tx))
    step = jax.jit(make_train_step(model, tx, num_classes=1000, mixup=True,
                                   mesa=mesa, mesa_start_step=0),
                   donate_argnums=(0,))

    batch_data = {
        "image": jax.device_put(jnp.ones((batch, image_size, image_size, 3), dtype)),
        "label": jax.device_put(jnp.zeros((batch,), jnp.int32)),
    }
    rng = jax.random.PRNGKey(0)

    def sync(st):
        return float(jnp.sum(st.params["stem"]["conv1"]["conv"]["kernel"][0, 0, 0]))

    state, _ = step(state, batch_data, rng)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(2):
        state, _ = step(state, batch_data, rng)
        sync(state)
    est = (time.perf_counter() - t0) / 2
    iters = max(3, min(500, int(timed_s / max(est, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, batch_data, rng)
    sync(state)
    return iters * batch / (time.perf_counter() - t0)


def main(argv=None):
    from recnext_tpu.utils.platform import honor_env_platform
    from recnext_tpu.utils.watchdog import require_devices

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+",
                   default=["mlla_nano_recattn_simple", "mlla_mini_recattn_simple"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--timed", type=float, default=6.0)
    p.add_argument("--image-size", type=int, default=0,
                   help="0 = the config's native img_size (256)")
    p.add_argument("--train", action="store_true",
                   help="full train-step throughput instead of inference")
    p.add_argument("--attn-impl", default="headbatch",
                   choices=["headbatch", "blockdiag"],
                   help="linear-attention formulation for the recattn "
                        "variants (blockdiag = channel-layout masked-dense, "
                        "the recnext a-family round-5 winner)")
    p.add_argument("--mesa", type=float, default=0.0,
                   help="with --train: MESA weight (the recipe's active phase "
                        "adds an EMA-teacher forward per step)")
    args = p.parse_args(argv)
    require_devices(metric="bench_mlla_device_init")

    rows = []
    for name in args.models:
        if args.train:
            ips = train_throughput(name, args.batch, timed_s=args.timed,
                                   image_size=args.image_size, mesa=args.mesa,
                                   attn_impl=args.attn_impl)
        else:
            ips = throughput(name, args.batch, timed_s=args.timed,
                             image_size=args.image_size,
                             attn_impl=args.attn_impl)
        row = {"model": name, "batch": args.batch,
               "image_size": args.image_size or 256,
               "attn_impl": args.attn_impl,
               "images_per_sec": round(ips, 1)}
        if args.train:
            row["mode"] = "train" if args.mesa == 0 else f"train+mesa{args.mesa}"
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


if __name__ == "__main__":
    main()
