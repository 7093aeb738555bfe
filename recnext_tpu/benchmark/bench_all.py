"""Sweep fused-inference throughput over the model zoo and write a results table —
the counterpart of the reference's per-model throughput records
(/root/reference/upload.py:12-34, measured by speed_gpu.py).

  python -m recnext_tpu.benchmark.bench_all --models recnext_m0 recnext_m1 \
      --out bench_results.json
"""

from __future__ import annotations

import argparse
import json
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
    p.add_argument("--latency", action="store_true",
                   help="also scan-chained batch-1 device latency")
    p.add_argument("--out", default="bench_results.json")
    p.add_argument("--resume", action="store_true",
                   help="skip models already present in --out (tunnel-outage "
                        "restartability; rows are flushed after every model)")
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compilation cache dir (or env "
                        "RECNEXT_COMPILE_CACHE)")
    args = p.parse_args(argv)

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
        row = {"model": name}
        try:
            ips, used_batch = bench_mod.throughput(name, args.batch,
                                                   timed_s=args.timed, **kw)
            row.update(images_per_sec=round(ips, 1), batch=used_batch)
            if used_batch != args.batch:
                row["batch_auto_split"] = True  # scoped-VMEM cliff (PERF.md)
            base = bench_mod.BASELINES.get(name)
            if base:
                row["rtx3090_baseline"] = base
                row["vs_baseline"] = round(ips / base, 3)
            if args.latency:
                # scan-chained on-device batch-1 latency (RTT-free; bench.py)
                row["batch1_device_ms"] = round(
                    bench_mod.device_latency_ms(name, **kw), 3)
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
