"""Per-variant lane-packing policy sweep (PERF.md round-2/3 campaigns).

Measures e2e fused-inference throughput of `models/packed_infer.packed_apply`
for a list of per-stage group tuples against the unpacked baseline, with the
chained-dependency timing loop from bench.py (naive timing over the axon
tunnel measures RTT, not the device — PERF.md "measurement pitfalls").

  python -m recnext_tpu.benchmark.sweep_packing --model recnext_m4 \
      --groups 1,1,1,1 2,1,1,1 1,2,1,1 1,1,2,1 1,1,1,2 --batch 256

Feeds MEASURED_GROUPS (models/packed_infer.py): only tuples that WIN on
hardware get a policy entry.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure(apply_fn, fvars, batch: int, dtype, timed_s: float = 6.0) -> float:
    @jax.jit
    def step(v, x):
        y = apply_fn(v, x)
        return x + (0.0 * jnp.sum(y)).astype(x.dtype)

    def sync(xx):
        return float(jnp.sum(xx[0, 0, 0]))

    x = jnp.ones((batch, 224, 224, 3), dtype)
    x = step(fvars, x)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(3):
        x = step(fvars, x)
        sync(x)
    est = (time.perf_counter() - t0) / 3
    iters = max(3, min(2000, int(timed_s / max(est, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(fvars, x)
    sync(x)
    return iters * batch / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m4")
    p.add_argument("--groups", nargs="+",
                   default=["1,1,1,1", "2,1,1,1", "1,2,1,1", "1,1,2,1", "1,1,1,2"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--timed", type=float, default=6.0)
    p.add_argument("--mlp-mode", default="grouped", choices=["grouped", "blockdiag"],
                   help="packed 1x1-mlp formulation: grouped conv (bit-exact, "
                        "shipping) or block-diagonal dense (one MXU contraction; "
                        "reopens the stage-0/1 packing frontier — PERF.md)")
    p.add_argument("--attn-impl", default="blockdiag",
                   choices=["headbatch", "blockdiag", "blockdiag_fused"],
                   help="A-family attention formulation (blockdiag packs g>1 "
                        "with no head transposes — the round-2/3 policy was "
                        "measured under headbatch; re-sweep before trusting it)")
    args = p.parse_args(argv)

    import bench as bench_mod

    from recnext_tpu.models.packed_infer import packed_apply
    from recnext_tpu.models.registry import get_config
    from recnext_tpu.utils.platform import honor_env_platform
    from recnext_tpu.utils.watchdog import require_devices

    honor_env_platform()
    require_devices(metric="sweep_packing_device_init")

    dtype = jnp.bfloat16
    kw = {"recconv_upsample": "matmul"} if args.model.startswith("recnext_m") else {}
    cfg = get_config(args.model, **kw)
    fvars = jax.device_put(bench_mod._bench_variables(args.model, dtype, **kw))

    results = []
    for gs in args.groups:
        groups = tuple(int(v) for v in gs.split(","))
        try:
            ips = measure(lambda v, x: packed_apply(v, cfg, x, groups=groups,
                                                    mlp_mode=args.mlp_mode,
                                                    attn_impl=args.attn_impl),
                          fvars, args.batch, dtype, args.timed)
        except Exception as e:
            print(json.dumps({"model": args.model, "groups": groups,
                              "error": str(e)[:200]}), flush=True)
            continue
        results.append((groups, ips))
        print(json.dumps({"model": args.model, "groups": groups,
                          "mlp_mode": args.mlp_mode, "attn_impl": args.attn_impl,
                          "images_per_sec": round(ips, 1)}), flush=True)
    if results:
        base = next((r for g, r in results if g == (1, 1, 1, 1)), None)
        best_g, best = max(results, key=lambda t: t[1])
        out = {"model": args.model, "best_groups": best_g,
               "best_img_per_s": round(best, 1)}
        if base:
            out["unpacked_img_per_s"] = round(base, 1)
            out["gain_pct"] = round(100 * (best / base - 1), 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
