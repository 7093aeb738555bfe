"""Batch-occupancy scan: walk each variant's throughput up the power-of-two
batch ladder until it stops improving — closing VERDICT r4 item 2 (round 4
scanned only m0/m1; the 256/512 defaults were extrapolated for the other 16
variants, while the reference's GPU methodology used max pow-2 batch,
/root/reference/upload.py:12-34).

Adaptive: per variant, measure the current shipping batch first, then climb
512 -> 1024 -> 2048; stop as soon as a step loses more than --tol (throughput
past the occupancy knee is monotone-flat, so one losing step ends the climb).
VMEM compile cliffs auto-split inside bench.throughput and end the climb too.

Rows append to --out after every measurement (tunnel-outage restartable with
--resume). When a larger batch beats the bench_results.json row by > --tol,
the row is NOT silently rewritten — merge deliberately with
benchmark.merge_results after reviewing the scan.

  python -m recnext_tpu.benchmark.occupancy_scan --out occupancy_r5.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    import os

    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=None,
                   help="default: every registry variant")
    p.add_argument("--batches", type=int, nargs="*", default=[512, 1024, 2048])
    p.add_argument("--timed", type=float, default=6.0)
    p.add_argument("--tol", type=float, default=0.01,
                   help="relative loss that ends a variant's climb")
    p.add_argument("--results", default="bench_results.json",
                   help="shipping table: provides the baseline batch/number")
    p.add_argument("--out", default="occupancy_r5.json")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--compile-cache", default="")
    args = p.parse_args(argv)

    from recnext_tpu.utils.cache import enable_compile_cache
    from recnext_tpu.utils.watchdog import require_devices

    import bench as bench_mod

    enable_compile_cache(args.compile_cache or None)
    require_devices(metric="occupancy_scan_device_init")

    shipping = {}
    if Path(args.results).exists():
        for r in json.loads(Path(args.results).read_text()):
            if "images_per_sec" in r:
                shipping[r["model"]] = r

    names = args.models
    if not names:
        from recnext_tpu.models.registry import list_models

        names = list_models()

    rows = []
    done = set()
    if args.resume and Path(args.out).exists():
        rows = json.loads(Path(args.out).read_text())
        done = {(r["model"], r["batch_requested"]) for r in rows}

    def flush():
        tmp = Path(args.out).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rows, indent=2))
        os.replace(tmp, args.out)

    for name in names:
        kw = {"recconv_upsample": "matmul"} if name.startswith("recnext_m") else {}
        base = shipping.get(name, {})
        best = float(base.get("images_per_sec", 0.0))
        best_batch = base.get("batch")
        for batch in args.batches:
            if best_batch and batch <= best_batch:
                continue  # the shipping row already covers this point
            if (name, batch) in done:
                prev = [r for r in rows if r["model"] == name
                        and r["batch_requested"] == batch][-1]
                ips = prev.get("images_per_sec", 0.0)
            else:
                row = {"model": name, "batch_requested": batch,
                       "measured_utc": time.strftime("%Y-%m-%d", time.gmtime()),
                       "stamp": "occupancy_r5"}
                try:
                    ips, used = bench_mod.throughput(
                        name, batch, timed_s=args.timed, **kw)
                    row.update(images_per_sec=round(ips, 1), batch=used)
                    if used != batch:
                        row["batch_auto_split"] = True
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"[:300]
                    ips = 0.0
                if best:
                    row["vs_shipping"] = round(ips / best, 4)
                rows.append(row)
                print(json.dumps(row), flush=True)
                flush()
            if ips > best:
                best, best_batch = ips, batch
            elif ips < best * (1.0 - args.tol):
                break  # past the knee
    return rows


if __name__ == "__main__":
    main()
