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

def _bench_variables(model_name: str, dtype, image_size: int = 224, **model_kwargs):
    """Shape-correct fused params without ANY init compile: eval_shape the unfused
    init (pure tracing), materialize ones on host, run the numpy fusion transform.
    Values are irrelevant for throughput; compiling init (CPU or TPU) costs minutes."""
    import numpy as np

    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.registry import create_model

    model = create_model(model_name, dtype=dtype, **model_kwargs)
    x0 = jnp.zeros((1, image_size, image_size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes)
    return fuse_params(variables)


BASELINES = {  # RTX3090 fused img/s, /root/reference/upload.py:12-34
    "recnext_m0": 750, "recnext_m1": 384, "recnext_m2": 325, "recnext_m3": 314,
    "recnext_m4": 169, "recnext_m5": 104,
    "recnext_a0": 4891, "recnext_a1": 2730, "recnext_a2": 2331, "recnext_a3": 2151,
    "recnext_a4": 1265, "recnext_a5": 733,
    "recnext_t": 13878, "recnext_s": 7989, "recnext_b": 4450,
    "recnext_t_share_channel": 13957, "recnext_s_share_channel": 8034,
    "recnext_b_share_channel": 4472,
}


def _is_vmem_compile_error(e: Exception) -> bool:
    msg = str(e)
    return any(s in msg for s in ("RESOURCE_EXHAUSTED", "vmem", "VMEM", "Mosaic",
                                  "scoped memory"))


def throughput(model_name: str, batch: int, *, dtype=jnp.bfloat16,
               warmup_s: float = 5.0, timed_s: float = 10.0,
               auto_split: bool = True, packed: bool = True,
               image_size: int = 224, attn_impl: str = "blockdiag",
               **model_kwargs):
    """Returns (images_per_sec, batch_used). If XLA's compile trips the scoped-VMEM
    cliff at the requested batch (the known recnext_a* @512 Mosaic bug, PERF.md),
    auto-retries at half the batch instead of failing the sweep.

    For the m and a families, `packed` (default) uses the lane-packed executor
    (models/packed_infer.py) — numerically exact vs model.apply and measured
    +16% on m1 (PERF.md round 2)."""
    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.registry import create_model, get_config

    cfg = get_config(model_name, **{k: v for k, v in model_kwargs.items()
                                    if k != "dtype"})
    if cfg.family == "a":
        # keep the unpacked (--no-packed) model forward on the same attention
        # formulation as the packed executor's attn_impl argument
        model_kwargs.setdefault("attn_impl", attn_impl)
    fused = create_model(model_name, fused=True, dtype=dtype, **model_kwargs)
    fvars = jax.device_put(_bench_variables(model_name, dtype, image_size,
                                            **model_kwargs))

    if packed and cfg.family in ("m", "a"):
        from recnext_tpu.models.packed_infer import packed_apply

        apply_fn = lambda v, x: packed_apply(v, cfg, x, attn_impl=attn_impl)
    else:
        apply_fn = lambda v, x: fused.apply(v, x, training=False)

    # Chained step: the next input depends on the previous logits, so every
    # iteration is a distinct computation — defeats any dispatch dedup/caching in
    # the remote runtime and keeps the device pipeline full (see PERF.md).
    @jax.jit
    def step(v, x):
        y = apply_fn(v, x)
        return x + (0.0 * jnp.sum(y)).astype(x.dtype)

    def sync(xx):
        # block_until_ready is unreliable over the axon tunnel (PERF.md); a tiny
        # scalar fetch is the only trustworthy drain of the dispatch queue.
        return float(jnp.sum(xx[0, 0, 0]))

    x = jnp.ones((batch, image_size, image_size, 3), dtype)
    try:
        x = step(fvars, x)
        sync(x)  # compile + first exec
    except Exception as e:  # graceful degradation instead of a compile cliff
        if auto_split and batch > 8 and _is_vmem_compile_error(e):
            return throughput(model_name, batch // 2, dtype=dtype,
                              warmup_s=warmup_s, timed_s=timed_s,
                              auto_split=auto_split, packed=packed,
                              image_size=image_size, attn_impl=attn_impl,
                              **model_kwargs)
        raise
    # warmup: run the chained step for ~warmup_s wall seconds (clock/power
    # settling — the speed_gpu.py:11-27 warmup-loop counterpart)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < warmup_s:
        x = step(fvars, x)
        sync(x)
    # calibrate with a few synced iterations
    t0 = time.perf_counter()
    ncal = 3
    for _ in range(ncal):
        x = step(fvars, x)
        sync(x)
    est = (time.perf_counter() - t0) / ncal
    iters = max(3, min(2000, int(timed_s / max(est, 1e-4))))
    # timed: enqueue the dependency chain, one final drain
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(fvars, x)
    sync(x)
    return iters * batch / (time.perf_counter() - t0), batch


def device_latency_ms(model_name: str, *, dtype=jnp.bfloat16, iters: int = 200,
                      image_size: int = 224, **model_kwargs) -> float:
    """On-device batch-1 latency: `iters` DEPENDENT fused forwards chained inside
    ONE jitted lax.scan (the benchmark/micro.py:18-37 device-timer pattern), so
    the single host<->device round-trip is paid once per run (not per iteration)
    and the serial dependency chain forbids any cross-iteration pipelining. That
    one remaining RTT (~32-36 ms here, PERF.md) would still add RTT/iters
    (~0.17 ms at iters=200 — up to ~2x on the sub-ms m0) to the result, so the
    same dispatch+drain structure is timed on a trivial computation and
    subtracted as a floor: latency = (wall - floor) / iters. This is the number
    the reference's latency benchmarks (speed_gpu.py with
    torch.cuda.synchronize, README.md:174-176 Core-ML latency) correspond to;
    the host-visible p50 from `latency_ms` includes the full RTT per call and is
    an environment artifact here (PERF.md "measurement pitfalls")."""
    from recnext_tpu.models.registry import create_model

    fused = create_model(model_name, fused=True, dtype=dtype, **model_kwargs)
    fvars = jax.device_put(_bench_variables(model_name, dtype, image_size,
                                            **model_kwargs))

    def one(carry, _):
        y = fused.apply(fvars, carry, training=False)
        # feed the logits back into the next input: serializes iterations and
        # defeats CSE (every scan step reads the previous step's output)
        return carry + (0.0 * jnp.sum(y)).astype(carry.dtype), ()

    @jax.jit
    def run(x0):
        final, _ = jax.lax.scan(one, x0, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    @jax.jit
    def noop(x0):  # one dispatch + one scalar drain: the per-run RTT floor
        return jnp.sum(x0.astype(jnp.float32))

    x = jnp.ones((1, image_size, image_size, 3), dtype)
    float(noop(x))  # compile
    floor = min(_timed(lambda: float(noop(x))) for _ in range(3))
    float(run(x))  # compile + first exec
    wall = min(_timed(lambda: float(run(x))) for _ in range(2))
    return max(wall - floor, 0.0) / iters * 1e3


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def latency_ms(model_name: str, *, dtype=jnp.bfloat16, iters: int = 100,
               image_size: int = 224, **model_kwargs) -> dict:
    """Batch-1 p50 latency (the iPhone/Core-ML latency counterpart measurement,
    /root/reference/README.md:174-176): chained steps, per-iteration scalar drain.

    Over the axon tunnel the per-dispatch round-trip (26-54 ms) dwarfs on-chip
    compute, so the RAW p50 is an environment artifact (PERF.md). We measure the
    RTT floor with an identically-synced trivial computation and report both the
    raw number and the RTT-subtracted estimate, flagged environment_limited when
    the floor dominates. `device_latency_ms` gives the RTT-free on-device number
    via a scan-chained in-program loop; prefer it."""
    import numpy as np

    from recnext_tpu.models.registry import create_model

    fused = create_model(model_name, fused=True, dtype=dtype, **model_kwargs)
    fvars = jax.device_put(_bench_variables(model_name, dtype, image_size,
                                            **model_kwargs))

    @jax.jit
    def step(v, x):
        y = fused.apply(v, x, training=False)
        return x + (0.0 * jnp.sum(y)).astype(x.dtype)

    @jax.jit
    def noop(x):
        return x + 1.0

    def timed_loop(fn, x0, n):
        x = fn(x0)
        float(jnp.sum(x[0, 0, 0]))  # compile + drain
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            x = fn(x)
            float(jnp.sum(x[0, 0, 0]))
            times.append(time.perf_counter() - t0)
        return float(np.percentile(np.asarray(times) * 1e3, 50))

    x = jnp.ones((1, image_size, image_size, 3), dtype)
    rtt_floor = timed_loop(noop, x, iters)
    p50 = timed_loop(lambda xx: step(fvars, xx), x, iters)
    compute_est = max(p50 - rtt_floor, 0.0)
    return {"p50_ms": p50, "rtt_floor_ms": rtt_floor,
            "compute_est_ms": compute_est,
            "environment_limited": bool(rtt_floor > 0.3 * p50)}


def train_throughput(model_name: str, batch: int, *, dtype=jnp.bfloat16,
                     timed_s: float = 6.0, auto_split: bool = True,
                     image_size: int = 224, repeats: int = 1, **model_kwargs):
    """Full training-step throughput (fwd+bwd+AdamW+EMA+mixup) on one chip.
    Returns (images_per_sec, batch_used[, spread]); like `throughput`, a
    scoped-VMEM compile cliff at the requested batch auto-retries at half.

    repeats>1 measures N independent timed windows and returns the MEDIAN plus
    a spread dict {min, max, runs} — the t-family's sub-ms steps showed ~20%
    run-to-run spread in round 4 (PERF.md), so single-window train numbers are
    not comparison-grade."""
    import numpy as np

    from recnext_tpu.models.registry import create_model
    from recnext_tpu.train.optim import cosine_schedule, make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_train_step

    model = create_model(model_name, dtype=dtype, **model_kwargs)
    x0 = jnp.zeros((1, image_size, image_size, 3), dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: (np.ones(s.shape, s.dtype) * 0.01), shapes)
    tx = make_optimizer(cosine_schedule(1e-3, 1000))
    state = jax.device_put(TrainState.create(variables, tx))
    step = jax.jit(make_train_step(model, tx, num_classes=1000, mixup=True),
                   donate_argnums=(0,))

    batch_data = {
        "image": jax.device_put(jnp.ones((batch, image_size, image_size, 3), dtype)),
        "label": jax.device_put(jnp.zeros((batch,), jnp.int32)),
    }
    rng = jax.random.PRNGKey(0)

    def sync(st):
        return float(jnp.sum(st.params["stem"]["conv1"]["conv"]["kernel"][0, 0, 0]))

    try:
        state, _ = step(state, batch_data, rng)
        sync(state)
    except Exception as e:
        if auto_split and batch > 8 and _is_vmem_compile_error(e):
            return train_throughput(model_name, batch // 2, dtype=dtype,
                                    timed_s=timed_s, auto_split=auto_split,
                                    image_size=image_size, repeats=repeats,
                                    **model_kwargs)
        raise
    t0 = time.perf_counter()
    for _ in range(2):
        state, _ = step(state, batch_data, rng)
        sync(state)
    est = (time.perf_counter() - t0) / 2
    iters = max(3, min(500, int(timed_s / max(est, 1e-4))))

    def one_window():
        t0 = time.perf_counter()
        for _ in range(iters):
            nonlocal_state[0], _ = step(nonlocal_state[0], batch_data, rng)
        sync(nonlocal_state[0])
        return iters * batch / (time.perf_counter() - t0)

    nonlocal_state = [state]
    runs = sorted(one_window() for _ in range(max(repeats, 1)))
    median = runs[len(runs) // 2] if len(runs) % 2 else \
        0.5 * (runs[len(runs) // 2 - 1] + runs[len(runs) // 2])
    if repeats <= 1:
        return runs[0], batch
    spread = {"min": round(runs[0], 1), "max": round(runs[-1], 1),
              "runs": [round(r, 1) for r in runs]}
    return median, batch, spread


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--latency", action="store_true", help="batch-1 p50 latency mode")
    p.add_argument("--latency-iters", type=int, default=200,
                   help="scan-chain length for the on-device latency measurement")
    p.add_argument("--train", action="store_true", help="training-step throughput mode")
    p.add_argument("--repeats", type=int, default=1,
                   help="--train only: N independent timed windows; reports the "
                        "median and a min/max spread (use >=3 for sub-50 ms steps)")
    p.add_argument("--image-size", type=int, default=224,
                   help="square input resolution (the reference ablates at 384, "
                        "README.md:459-479)")
    p.add_argument("--timed", type=float, default=10.0)
    p.add_argument("--warmup", type=float, default=5.0)
    p.add_argument("--upsample", default="matmul", choices=["gather", "matmul"])
    p.add_argument("--no-packed", action="store_true",
                   help="disable the lane-packed m/a-family executor")
    p.add_argument("--attn-impl", default="blockdiag",
                   choices=["headbatch", "blockdiag", "blockdiag_fused"],
                   help="A-family linear-attention formulation in the packed "
                        "executor (blockdiag = shipping default since round 5, "
                        "+7-18%% on a0-a2; headbatch = pre-round-5 A/B form)")
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE); warm restarts skip the "
                        "2-4 min first compile")
    args = p.parse_args()


    from recnext_tpu.utils.cache import enable_compile_cache
    from recnext_tpu.utils.watchdog import require_devices

    # Honor an explicit JAX_PLATFORMS (e.g. cpu) over the site hook's TPU pin,
    # same pattern as validate.py / export.py — lets the CLI be driven on CPU.
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    enable_compile_cache(args.compile_cache or None)
    # Fail loudly (one JSON error line, rc=17) instead of hanging forever if the
    # axon tunnel is down / the single-client chip is held by another process.
    require_devices(metric=f"{args.model}_device_init")

    kw = {}
    if args.model.startswith("recnext_m"):
        kw["recconv_upsample"] = args.upsample
    elif args.model.startswith("recnext_a"):
        # --latency / --train run the MODEL forward (not the packed executor);
        # attn_impl is a config field there, so the A/B lever reaches both paths
        kw["attn_impl"] = args.attn_impl
    size = args.image_size
    if args.latency:
        dev_ms = device_latency_ms(args.model, iters=args.latency_iters,
                                   image_size=size, **kw)
        lat = latency_ms(args.model, iters=min(args.latency_iters, 100),
                         image_size=size, **kw)
        rec = {"metric": f"{args.model}_fused_bf16_{size}_batch1_device_ms",
               "value": round(dev_ms, 3), "unit": "ms",
               "vs_baseline": None,
               "host_p50_ms": round(lat["p50_ms"], 3),
               "rtt_floor_ms": round(lat["rtt_floor_ms"], 3)}
        if lat["environment_limited"]:
            rec["note"] = ("host_p50 dominated by per-dispatch tunnel RTT; "
                           "value is the scan-chained on-device latency")
        print(json.dumps(rec))
        return
    if args.train:
        out = train_throughput(args.model, args.batch, timed_s=args.timed,
                               image_size=size, repeats=args.repeats, **kw)
        ips, used_batch = out[0], out[1]
        rec = {"metric": f"{args.model}_train_bf16_{size}_images_per_sec",
               "value": round(ips, 2), "unit": "images/sec",
               "vs_baseline": None}
        if len(out) == 3:
            rec["spread"] = out[2]
        if used_batch != args.batch:
            rec["batch_used"] = used_batch
        print(json.dumps(rec))
        return
    ips, used_batch = throughput(args.model, args.batch, warmup_s=args.warmup,
                                 timed_s=args.timed, packed=not args.no_packed,
                                 image_size=size, attn_impl=args.attn_impl,
                                 **{k: v for k, v in kw.items()
                                    if k != "attn_impl"})
    base = BASELINES.get(args.model) if size == 224 else None
    rec = {
        "metric": f"{args.model}_fused_bf16_{size}_images_per_sec",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / base, 3) if base else None,
    }
    if used_batch != args.batch:
        rec["batch_used"] = used_batch
        rec["caveat"] = (f"requested batch {args.batch} tripped an XLA scoped-VMEM "
                         f"compile failure; auto-split to {used_batch}")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
