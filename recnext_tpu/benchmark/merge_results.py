"""Merge bench_all sweep files (e.g. a batch-256 and a batch-512 run) into one
best-of-batch results table — the role of the reference's per-model throughput
records (/root/reference/upload.py:12-34, which report each model's best
measured configuration).

  python -m recnext_tpu.benchmark.merge_results b256.json b512.json \
      --out bench_results.json --markdown

Per model the row with the higher images_per_sec wins; `batch1_device_ms`
(measured batch-independently) is carried over from whichever input has it.
Error rows are dropped. `--markdown` also prints the PERF.md headline table.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def merge(rows_lists):
    by = {}
    order = []
    for rows in rows_lists:
        for r in rows:
            if "error" in r or "images_per_sec" not in r:
                continue
            name = r["model"]
            cur = by.get(name)
            if cur is None:
                by[name] = dict(r)
                order.append(name)
            elif r["images_per_sec"] > cur["images_per_sec"]:
                lat = cur.get("batch1_device_ms")
                by[name] = dict(r)
                if lat is not None:
                    by[name].setdefault("batch1_device_ms", lat)
            elif "batch1_device_ms" in r:
                cur.setdefault("batch1_device_ms", r["batch1_device_ms"])
    return [by[n] for n in order]


def markdown_table(rows) -> str:
    has_lat = any("batch1_device_ms" in r for r in rows)
    head = "| model | TPU v5e img/s | RTX3090 img/s | ratio |"
    sep = "|---|---|---|---|"
    if has_lat:
        head += " batch-1 ms |"
        sep += "---|"
    lines = [head, sep]
    for r in rows:
        base = r.get("rtx3090_baseline")
        ratio = f"{r['vs_baseline']:.1f}x" if r.get("vs_baseline") else "-"
        line = (f"| {r['model']} | {r['images_per_sec']:.0f} | "
                f"{base if base else '-'} | {ratio} |")
        if has_lat:
            lat = r.get("batch1_device_ms")
            line += f" {lat:.2f} |" if lat is not None else " - |"
        lines.append(line)
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+", help="bench_all output files")
    p.add_argument("--out", default="bench_results.json")
    p.add_argument("--markdown", action="store_true",
                   help="print the PERF.md headline table")
    args = p.parse_args(argv)

    rows = merge([json.loads(Path(f).read_text()) for f in args.inputs])
    Path(args.out).write_text(json.dumps(rows, indent=2))
    print(f"wrote {args.out} ({len(rows)} models)")
    if args.markdown:
        print(markdown_table(rows))
    return rows


if __name__ == "__main__":
    main()
