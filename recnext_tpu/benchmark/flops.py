"""Parameter and FLOP counting via XLA cost analysis.

Counterpart of /root/reference/flops.py:11-40 (fvcore FlopCountAnalysis + param count
on the fused model). XLA's compiled cost analysis counts every fused HLO op, so the
number reflects what actually executes on the TPU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def count_params(params: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def count_flops(fn, *args) -> float:
    """Total FLOPs of jit(fn)(*args) per XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def model_flops(model_name: str, input_size: int = 224, fused: bool = True,
                batch: int = 1) -> Tuple[int, float]:
    """(params, MACs) for a registry model at the given resolution (MACs = FLOPs/2,
    matching fvcore's multiply-add convention)."""
    from recnext_tpu.fusion import fuse_params
    from recnext_tpu.models.registry import create_model

    model = create_model(model_name, fused=False)
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    if fused:
        variables = fuse_params(variables)
        model = create_model(model_name, fused=True)
    n_params = count_params(variables["params"])

    def fwd(v, xx):
        return model.apply(v, xx, training=False)

    flops = count_flops(fwd, variables, x) / batch
    return n_params, flops / 2.0


def mlla_flops(model_name: str, input_size: int = 0,
               batch: int = 1) -> Tuple[int, float]:
    """(params, MACs) for an MLLA graft variant at its native resolution
    (256 by default — the recattn grafts need even stage sizes). The reference
    publishes params/FLOPs for these in its ablation section
    (/root/reference/mlla/README.md)."""
    from recnext_tpu.models.mlla import create_mlla

    model = create_mlla(model_name)
    input_size = input_size or model.cfg.img_size
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    n_params = count_params(variables["params"])

    def fwd(v, xx):
        return model.apply(v, xx, training=False)

    flops = count_flops(fwd, variables, x) / batch
    return n_params, flops / 2.0


def task_flops(task: str, backbone: str, input_size: int,
               num_classes: int) -> Tuple[int, float]:
    """(params, MACs) for a downstream-task model — the counterpart of the mm
    harness FLOP counters (/root/reference/segmentation/tools/get_flops.py,
    detection get_model_complexity_info usage). Counts the full inference
    forward (backbone + FPN + heads) at the given square input."""
    from recnext_tpu.models.registry import get_config

    cfg = get_config(backbone, num_classes=0)
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if task == "seg":
        from recnext_tpu.tasks.segmentation import SemanticFPN

        model = SemanticFPN(backbone_cfg=cfg, num_classes=num_classes)
    elif task == "retinanet":
        from recnext_tpu.tasks.detection import RetinaNet

        model = RetinaNet(backbone_cfg=cfg, num_classes=num_classes,
                          frozen_backbone_stats=False)
    elif task == "mask_rcnn":
        from recnext_tpu.tasks.mask_rcnn import MaskRCNN

        model = MaskRCNN(backbone_cfg=cfg, num_classes=num_classes,
                         frozen_backbone_stats=False)
    else:
        raise ValueError(f"unknown task {task!r}")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_params = count_params(variables["params"])

    def fwd(v, xx):
        return model.apply(v, xx, training=False)

    return n_params, count_flops(fwd, variables, x) / 2.0


def main():


    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="recnext_m1")
    p.add_argument("--input-size", type=int, default=0,
                   help="default: 224 (cls) / 512 (seg, det)")
    p.add_argument("--unfused", action="store_true")
    p.add_argument("--task", default="cls",
                   choices=["cls", "seg", "retinanet", "mask_rcnn"],
                   help="seg/det = mm get_flops.py counterpart")
    p.add_argument("--num-classes", type=int, default=0,
                   help="default: 1000 (cls) / 150 (seg) / 80 (det)")
    args = p.parse_args()
    if args.task == "cls":
        size = args.input_size or 224
        n, macs = model_flops(args.model, size, fused=not args.unfused)
    else:
        size = args.input_size or 512
        nc = args.num_classes or (150 if args.task == "seg" else 80)
        n, macs = task_flops(args.task, args.model, size, nc)
    print(json.dumps({"model": args.model, "task": args.task, "input_size": size,
                      "params_M": round(n / 1e6, 2),
                      "macs_G": round(macs / 1e9, 3)}))


if __name__ == "__main__":
    main()
