"""Sweep fused-inference (or full-train-step) throughput over the model zoo and
write a results table — the counterpart of the reference's per-model throughput
records (/root/reference/upload.py:12-34, measured by speed_gpu.py). The
reference publishes no train-throughput table; `--train` produces one anyway.

  python -m recnext_tpu.benchmark.bench_all --models recnext_m0 recnext_m1 \
      --latency --out bench_results.json
  python -m recnext_tpu.benchmark.bench_all --train --batch 256 \
      --out bench_train_results.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    import os

    import bench as bench_mod  # repo-root bench.py

    # without this a CPU-intended sweep claims the single-client chip
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=["recnext_m0", "recnext_m1"])
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--timed", type=float, default=6.0)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--latency", action="store_true",
                   help="also scan-chained batch-1 device latency")
    p.add_argument("--train", action="store_true",
                   help="full-train-step throughput (fwd+bwd+AdamW+EMA+mixup) "
                        "instead of fused inference; use --batch 256 (the "
                        "measured per-chip sweet spot, PERF.md)")
    p.add_argument("--repeats", type=int, default=3,
                   help="--train: independent timed windows per model; the row "
                        "records the median + {min,max,runs} spread")
    p.add_argument("--stamp", default="",
                   help="provenance label recorded in every row (e.g. 'round4')")
    p.add_argument("--out", default="bench_results.json")
    p.add_argument("--resume", action="store_true",
                   help="skip models already present in --out (tunnel-outage "
                        "restartability; rows are flushed after every model)")
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE)")
    args = p.parse_args(argv)
    if args.train and args.latency:
        # batch1_device_ms is an inference-graph measurement; silently dropping
        # it from --train rows misstated provenance (ADVICE r4)
        p.error("--latency measures the fused inference graph and is not "
                "defined for --train rows; run two sweeps")

    from recnext_tpu.utils.cache import enable_compile_cache
    from recnext_tpu.utils.watchdog import require_devices

    enable_compile_cache(args.compile_cache or None)
    require_devices(metric="bench_all_device_init")

    rows = []
    if args.resume and Path(args.out).exists():
        # keep EVERY prior row (a subset --models retry must not drop other
        # models' measured rows); drop only errored rows we are about to retry
        rows = [r for r in json.loads(Path(args.out).read_text())
                if not (r["model"] in args.models and "error" in r)]
    done = {r["model"] for r in rows}
    for name in args.models:
        if name in done:
            continue
        kw = {"recconv_upsample": "matmul"} if name.startswith("recnext_m") else {}
        # measurement provenance, queried by the docs-truth checks: which sweep
        # produced the number, at what resolution, when
        row = {"model": name, "image_size": args.image_size,
               "measured_utc": time.strftime("%Y-%m-%d", time.gmtime())}
        if args.stamp:
            row["stamp"] = args.stamp
        try:
            if args.train:
                # median-of-N with min/max: t-family steps are ~35 ms with ~20%
                # run-to-run spread (PERF.md round 4), single windows mislead
                out = bench_mod.train_throughput(
                    name, args.batch, timed_s=args.timed,
                    image_size=args.image_size, repeats=args.repeats, **kw)
                ips, used_batch = out[0], out[1]
                row.update(train_images_per_sec=round(ips, 1), batch=used_batch)
                if len(out) == 3:
                    row["spread"] = out[2]
            else:
                ips, used_batch = bench_mod.throughput(
                    name, args.batch, timed_s=args.timed,
                    image_size=args.image_size, **kw)
                row.update(images_per_sec=round(ips, 1), batch=used_batch)
                base = (bench_mod.BASELINES.get(name)
                        if args.image_size == 224 else None)
                if base:
                    row["rtx3090_baseline"] = base
                    row["vs_baseline"] = round(ips / base, 3)
                if args.latency:
                    # scan-chained on-device batch-1 latency (RTT-free; bench.py)
                    row["batch1_device_ms"] = round(
                        bench_mod.device_latency_ms(
                            name, image_size=args.image_size, **kw), 3)
            if used_batch != args.batch:
                row["batch_auto_split"] = True  # scoped-VMEM cliff (PERF.md)
        except Exception as e:  # keep sweeping; rerun with --resume to retry
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        rows.append(row)
        print(json.dumps(row), flush=True)
        # atomic flush: a kill mid-write must not corrupt the resume file
        tmp = Path(args.out).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rows, indent=2))
        os.replace(tmp, args.out)
    return rows


if __name__ == "__main__":
    main()
