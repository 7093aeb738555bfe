"""Component-wise training-step timing on the real TPU.

Decomposes the full train step (fwd+bwd+AdamW+EMA+BN-stats+mixup; reference
semantics /root/reference/engine.py:21-75) into separately-timed compiled
pieces so the train/infer throughput ratio is explained with numbers per
component (VERDICT round-2 item 4). Uses the scan-chained device timer from
benchmark/micro.py — naive per-call timing over the axon tunnel measures the
26-54 ms RTT, not the device (PERF.md "measurement pitfalls").

Components:
  full       complete train_step (the img/s that training actually gets)
  fwd        loss forward incl. BN batch-stat update
  fwd_bwd    value_and_grad only (no optimizer/EMA)
  opt        AdamW update + apply_updates on fixed grads
  ema        EMA update of params + batch_stats
  mixup      on-device mixup/cutmix batch transform
  eval_fwd   inference forward of the SAME unfused model (training=False)

Usage: python -m recnext_tpu.benchmark.train_breakdown --model recnext_m1 \
         --batch 256 [--remat] [--no-ema] [--iters 10]
Prints one JSON line per component plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_scan(step_fn, carry0, iters: int):
    """Device ms/iter: `iters` dependent invocations chained in one jitted scan."""

    @jax.jit
    def run(c):
        final, _ = jax.lax.scan(lambda c, _: (step_fn(c), ()), c, None,
                                length=iters)
        return final

    r = run(carry0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(carry0)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args(argv)


    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import optax

    from recnext_tpu.data.mixup import mixup_cutmix
    from recnext_tpu.models.registry import create_model
    from recnext_tpu.train.losses import label_smoothing_cross_entropy
    from recnext_tpu.train.optim import cosine_schedule, make_optimizer
    from recnext_tpu.train.state import TrainState, ema_update
    from recnext_tpu.train.step import make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = create_model(args.model, dtype=dtype)
    x0 = jnp.zeros((1, args.size, args.size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: np.full(s.shape, 0.01, s.dtype), shapes)
    tx = make_optimizer(cosine_schedule(1e-3, 1000))
    state = jax.device_put(TrainState.create(variables, tx, ema=not args.no_ema))

    x = jax.device_put(jnp.ones((args.batch, args.size, args.size, 3), dtype))
    y = jax.device_put(jnp.zeros((args.batch,), jnp.int32))
    batch = {"image": x, "label": y}
    rng = jax.random.PRNGKey(0)

    results = {}

    # -- full step ---------------------------------------------------------
    train_step = make_train_step(model, tx, num_classes=1000, mixup=True,
                                 remat=args.remat,
                                 ema_decay=0.99996)
    results["full"] = time_scan(lambda st: train_step(st, batch, rng)[0],
                                state, args.iters)

    # -- forward only (training=True, BN stats update) ---------------------
    def fwd(st):
        out, mut = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats}, x,
            training=True, mutable=["batch_stats"],
            rngs={"droppath": rng, "dropout": rng})
        loss = label_smoothing_cross_entropy(out, y, smoothing=0.1)
        # thread loss into the carry so nothing is DCE'd
        return st.replace(batch_stats=mut["batch_stats"],
                          step=st.step + (loss > -1e9).astype(jnp.int32))

    results["fwd"] = time_scan(fwd, state, args.iters)

    # -- forward + backward (no optimizer / EMA) ---------------------------
    def loss_only(params, batch_stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            training=True, mutable=["batch_stats"],
            rngs={"droppath": rng, "dropout": rng})
        return label_smoothing_cross_entropy(out, y, smoothing=0.1), mut

    def fwd_bwd(st):
        (loss, mut), grads = jax.value_and_grad(loss_only, has_aux=True)(
            st.params, st.batch_stats)
        # tiny-epsilon update: keeps the grad computation live without an
        # optimizer (cannot be folded away like p - 0*g would be)
        new_params = jax.tree.map(lambda p, g: p - 1e-30 * g.astype(p.dtype),
                                  st.params, grads)
        return st.replace(params=new_params, batch_stats=mut["batch_stats"])

    results["fwd_bwd"] = time_scan(fwd_bwd, state, args.iters)

    # -- optimizer alone on fixed grads ------------------------------------
    grads0 = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), state.params)

    def opt_only(carry):
        params, opt_state = carry
        updates, new_opt = tx.update(grads0, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    results["opt"] = time_scan(opt_only, (state.params, state.opt_state),
                               args.iters)

    # -- EMA alone ---------------------------------------------------------
    if not args.no_ema:
        def ema_only(carry):
            ep, es = carry
            return (ema_update(ep, state.params, 0.99996),
                    ema_update(es, state.batch_stats, 0.99996))

        results["ema"] = time_scan(
            ema_only, (state.ema_params, state.ema_batch_stats), args.iters)

    # -- mixup alone -------------------------------------------------------
    def mix_only(xx):
        xm, _ = mixup_cutmix(rng, xx, y, num_classes=1000)
        return xm.astype(xx.dtype)

    results["mixup"] = time_scan(mix_only, x, args.iters)

    # -- inference forward of the same (unfused) model ---------------------
    def eval_fwd(xx):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, xx[0],
                          training=False)
        # fold the logits back into the image carry for the dependency chain
        return (xx[0] + out[0, 0].astype(dtype) * 1e-30, )

    results["eval_fwd"] = time_scan(eval_fwd, (x,), args.iters)

    full = results["full"]
    for k, v in results.items():
        print(json.dumps({"component": k, "ms": round(v, 3),
                          "pct_of_full": round(100 * v / full, 1)}), flush=True)
    accounted = (results["fwd_bwd"] + results.get("opt", 0.0)
                 + results.get("ema", 0.0) + results["mixup"])
    print(json.dumps({
        "model": args.model, "batch": args.batch, "remat": args.remat,
        "train_img_per_s": round(args.batch / full * 1e3, 1),
        "bwd_minus_fwd_ms": round(results["fwd_bwd"] - results["fwd"], 3),
        "accounted_ms": round(accounted, 3),
        "unaccounted_ms": round(full - accounted, 3),
        "train_over_eval_fwd": round(full / results["eval_fwd"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
