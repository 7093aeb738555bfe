"""Model-card generation — the counterpart of the reference's HF publishing tooling
(/root/reference/upload.py:10-100 + model_card_template.md): emits a markdown card per
variant with architecture config, measured params/MACs, and (optionally) measured TPU
throughput, alongside the published fused artifact from recnext_tpu.export.

  python -m recnext_tpu.benchmark.modelcard --model recnext_m1 --out cards/
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

TEMPLATE = """---
tags:
- image-classification
- recnext-tpu
library_name: recnext_tpu
license: apache-2.0
---

# {name} (TPU-native RecNeXt)

RecNeXt backbone ({family_long}) re-built TPU-first in JAX/Flax. Paper:
*RecConv: Efficient Recursive Convolutions for Multi-Frequency Representations*
(arXiv 2412.19628).

## Architecture

| field | value |
|---|---|
| family | {family} |
| embed_dim | {embed_dim} |
| depth | {depth} |
| mlp_ratio | {mlp_ratio} |
| params (fused) | {params_m:.2f} M |
| MACs @224 (fused) | {macs_g:.3f} G |
{extra_rows}

## Usage

```python
from recnext_tpu.models.registry import create_model
from recnext_tpu.export import load_published

model = create_model("{name}", fused=True)
variables = load_published("{name}", "published/")
logits = model.apply(variables, images_nhwc, training=False)
```
"""

FAMILY_LONG = {"m": "RecConv token mixer", "a": "RecAttn linear-attention mixer",
               "l": "LSNet-style partial-channel mixer"}

MLLA_TEMPLATE = """---
tags:
- image-classification
- recnext-tpu
library_name: recnext_tpu
license: apache-2.0
---

# {name} (TPU-native RecNeXt — MLLA graft family)

{variant_long} grafted into the MLLA (Swin-style) architecture — the
reference's ablation family (/root/reference/mlla/), re-built TPU-first in
JAX/Flax. LayerNorm-based (no BN-fusion form); native input 256² (the recattn
grafts need even stage sizes).

## Architecture

| field | value |
|---|---|
| variant | {variant} |
| embed_dim | {embed_dim} |
| depths | {depths} |
| num_heads | {num_heads} |
| params | {params_m:.2f} M |
| MACs @256 | {macs_g:.3f} G |
{extra_rows}
## Training

The main CLI trains this family with the reference recipe
(`--config configs/mlla_{size}_300e.yaml`): AdamW wd 0.05, global-norm clip
5.0, 20 warmup epochs, MESA EMA-self-distillation from 25% of training.

```python
from recnext_tpu.models.mlla import create_mlla

model = create_mlla("{name}")
logits = model.apply(variables, images_nhwc, training=False)
```
"""

MLLA_VARIANT_LONG = {
    "recconv": "RecConv2d aggregator (nearest x2 pyramid)",
    "recattn": "RoPE linear-attention RecAttn aggregator",
    "recattn_simple": "simplified (ELU+1, rope-free) RecAttn aggregator",
}


def make_mlla_card(model_name: str, measured: dict | None = None) -> str:
    from recnext_tpu.benchmark.flops import mlla_flops
    from recnext_tpu.models.mlla import MLLA_CONFIGS

    cfg = MLLA_CONFIGS[model_name]
    n_params, macs = mlla_flops(model_name)
    extra = ""
    if measured:
        # batch/resolution read from the measured row itself — a sweep at a
        # non-default batch must not misstate measurement provenance (ADVICE r4)
        size = measured.get("image_size", 256)
        if measured.get("images_per_sec"):
            extra += (f"| TPU v5e throughput (bf16 @{size}, "
                      f"batch {measured.get('batch', '?')}) | "
                      f"{measured['images_per_sec']:.0f} img/s |\n")
        if measured.get("train_images_per_sec"):
            extra += (f"| TPU v5e train step (full recipe, "
                      f"batch {measured.get('train_batch', measured.get('batch', '?'))}) | "
                      f"{measured['train_images_per_sec']:.0f} img/s |\n")
    size = "nano" if "nano" in model_name else "mini"
    return MLLA_TEMPLATE.format(
        name=model_name, variant=cfg.variant,
        variant_long=MLLA_VARIANT_LONG[cfg.variant], embed_dim=cfg.embed_dim,
        depths=cfg.depths, num_heads=cfg.num_heads, params_m=n_params / 1e6,
        macs_g=macs / 1e9, extra_rows=extra, size=size,
    )


def make_card(model_name: str, throughput: float | None = None,
              measured: dict | None = None) -> str:
    """`measured` is a bench_results.json row for this model (bench_all output);
    when given, the card carries the measured TPU table: throughput, ratio vs
    the reference's RTX3090 number (upload.py:12-34), and the scan-chained
    batch-1 device latency."""
    from recnext_tpu.benchmark.flops import model_flops
    from recnext_tpu.models.registry import get_config

    cfg = get_config(model_name)
    n_params, macs = model_flops(model_name, 224, fused=True)
    if measured and not throughput:
        throughput = measured.get("images_per_sec")
    extra = ""
    if throughput:
        extra = f"| TPU v5e throughput (fused bf16 @224) | {throughput:.0f} img/s |\n"
    if measured:
        if measured.get("vs_baseline"):
            extra += (f"| vs RTX3090 (reference fused img/s) | "
                      f"{measured['vs_baseline']:.1f}x |\n")
        if measured.get("batch1_device_ms"):
            extra += (f"| batch-1 device latency (fused bf16 @224) | "
                      f"{measured['batch1_device_ms']:.2f} ms |\n")
    return TEMPLATE.format(
        name=model_name, family=cfg.family, family_long=FAMILY_LONG[cfg.family],
        embed_dim=cfg.embed_dim, depth=cfg.depth, mlp_ratio=cfg.mlp_ratio,
        params_m=n_params / 1e6, macs_g=macs / 1e9, extra_rows=extra,
    )


def main(argv=None):


    # honor an explicit JAX_PLATFORMS over any site default (the cost analysis
    # must not claim the single-client TPU just to count MACs on CPU)
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--model", help="one variant (or use --all)")
    p.add_argument("--all", action="store_true",
                   help="regenerate cards for every registry variant")
    p.add_argument("--mlla-all", action="store_true",
                   help="regenerate cards for the 6 MLLA graft variants")
    p.add_argument("--out", default="cards")
    p.add_argument("--throughput", type=float, default=None)
    p.add_argument("--results", default=None,
                   help="bench_results.json (bench_all output); adds measured "
                        "throughput / vs-RTX3090 / batch-1 latency rows")
    args = p.parse_args(argv)
    if sum([bool(args.model), args.all, args.mlla_all]) != 1:
        p.error("exactly one of --model / --all / --mlla-all")

    measured_by_model = {}
    if args.results:
        measured_by_model = {r["model"]: r
                             for r in json.loads(Path(args.results).read_text())
                             if "error" not in r}

    from recnext_tpu.models.registry import list_models

    if args.mlla_all:
        from recnext_tpu.models.mlla import MLLA_CONFIGS

        names = sorted(MLLA_CONFIGS)
    else:
        names = list_models() if args.all else [args.model]
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name.startswith("mlla"):
            card = make_mlla_card(name, measured=measured_by_model.get(name))
        else:
            card = make_card(name, args.throughput,
                             measured=measured_by_model.get(name))
        path = out / f"{name}.md"
        path.write_text(card)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
