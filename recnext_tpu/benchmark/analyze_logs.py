"""Training-log analysis: plot metric curves and epoch-time statistics.

Counterpart of /root/reference/segmentation/tools/analyze_logs.py (plot_curve over
mmcv JSON logs) and the mmdet original's `cal_train_time`. Works over every JSONL
log this framework writes: the classification per-epoch `log.txt`
(train/main.py), the detection CLI log (epoch-keyed), and the segmentation CLI
log (iter-keyed) — non-JSON lines (JAX warnings, progress prints) are skipped, so
raw captured stdout logs work too.

  python -m recnext_tpu.benchmark.analyze_logs plot_curve log.txt --keys test_acc1 ema_test_acc1 --out acc.png
  python -m recnext_tpu.benchmark.analyze_logs plot_curve seg.log --keys mIoU
  python -m recnext_tpu.benchmark.analyze_logs cal_train_time log.txt
  python -m recnext_tpu.benchmark.analyze_logs best log.txt --keys test_acc1
"""

from __future__ import annotations

import argparse
import json
from typing import List


def load_records(path: str) -> List[dict]:
    """Parse a JSONL log, skipping any non-JSON (warning/progress) lines."""
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(rec, dict):
                records.append(rec)
    return records


def _x_axis(records: List[dict]):
    """(name, values): epoch-keyed logs plot against epoch, iter-keyed against iter."""
    if records and "epoch" in records[0]:
        return "epoch", [r.get("epoch", i) for i, r in enumerate(records)]
    if records and "iter" in records[0]:
        return "iter", [r.get("iter", i) for i, r in enumerate(records)]
    return "step", list(range(len(records)))


def plot_curve(args) -> None:
    import matplotlib

    if args.out is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    legends = args.legend
    if legends is None:
        legends = [f"{p}:{k}" for p in args.json_logs for k in args.keys]
    if len(legends) != len(args.json_logs) * len(args.keys):
        raise SystemExit("--legend must have len(json_logs) * len(keys) entries")

    ax = plt.gca()
    xlabel = "step"
    for i, path in enumerate(args.json_logs):
        records = load_records(path)
        xlabel, xs = _x_axis(records)
        for j, key in enumerate(args.keys):
            pts = [(x, r[key]) for x, r in zip(xs, records) if key in r]
            if not pts:
                print(f"{path}: no records with key {key!r}")
                continue
            ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o",
                    markersize=3, label=legends[i * len(args.keys) + j])
    ax.set_xlabel(xlabel)
    ax.legend()
    if args.title:
        ax.set_title(args.title)
    if args.out is None:
        plt.show()
    else:
        plt.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"saved curve to {args.out}")


def cal_train_time(args) -> None:
    """Per-log timing stats over epoch_time_s / elapsed_s / images_per_sec
    (the mmdet analyze_logs `cal_train_time` counterpart)."""
    for path in args.json_logs:
        records = load_records(path)
        out = {"log": path, "records": len(records)}
        times = [r["epoch_time_s"] for r in records if "epoch_time_s" in r]
        if not times:
            # iter-keyed logs record cumulative elapsed_s; diff to per-record time
            elapsed = [r["elapsed_s"] for r in records if "elapsed_s" in r]
            times = [b - a for a, b in zip(elapsed, elapsed[1:]) if b >= a]
        if times:
            times_sorted = sorted(times)
            out.update(
                time_mean_s=round(sum(times) / len(times), 2),
                time_p50_s=round(times_sorted[len(times) // 2], 2),
                time_min_s=round(times_sorted[0], 2),
                time_max_s=round(times_sorted[-1], 2),
            )
        ips = [r["images_per_sec"] for r in records if "images_per_sec" in r]
        if ips:
            out["images_per_sec_mean"] = round(sum(ips) / len(ips), 1)
        print(json.dumps(out))


def best(args) -> None:
    """Max of each key with the epoch/iter it occurred at — the programmatic form
    of the reference README's `jq -s "map(.test_acc1) | max"` log-replay check
    (/root/reference/README.md:110-113)."""
    for path in args.json_logs:
        records = load_records(path)
        _, xs = _x_axis(records)
        for key in args.keys:
            pts = [(v[key], x) for x, v in zip(xs, records) if key in v]
            if not pts:
                print(json.dumps({"log": path, "key": key, "best": None}))
                continue
            val, at = max(pts)
            print(json.dumps({"log": path, "key": key, "best": val, "at": at}))


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Analyze JSONL training logs")
    sub = parser.add_subparsers(dest="task", required=True)
    for name in ("plot_curve", "cal_train_time", "best"):
        p = sub.add_parser(name)
        p.add_argument("json_logs", nargs="+")
        if name != "cal_train_time":
            p.add_argument("--keys", nargs="+", default=["test_acc1"])
        if name == "plot_curve":
            p.add_argument("--title", default=None)
            p.add_argument("--legend", nargs="+", default=None)
            p.add_argument("--out", default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    {"plot_curve": plot_curve, "cal_train_time": cal_train_time, "best": best}[args.task](args)


if __name__ == "__main__":
    main()
