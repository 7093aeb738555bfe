"""Model-level compute-roofline analysis: how close each variant's measured
throughput is to the chip's speed of light.

The reference frames speed only relatively (img/s vs other models,
/root/reference/speed_gpu.py); the RecConv op-level analysis here (PERF.md
"Where m1's 31.7 ms goes") already stated the VPU bound for one op — this tool
extends it to every registry variant so the headline table can say "X% of the
compute roofline", an absolute claim.

Method: trace the FUSED inference forward to a jaxpr (pure tracing — no compile,
no device) and classify every primitive onto the engine that executes it:

* MXU  — dense contractions: `dot_general`, and `conv_general_dilated` with
  feature_group_count == 1 (1x1/3x3 dense convs). Grouped-but-not-depthwise
  convs (the L family's gcd-grouped downsample) also ride the MXU per group.
* VPU  — depthwise convs (feature_group_count == out_channels: 25 MACs/elem for
  a 5x5 runs on the 8x128 vector unit, PERF.md RecConv analysis) plus all
  elementwise arithmetic (add/mul/erfc/...), counted per output element.

Bounds (one v5e chip, public peaks):
* MXU bf16: 197 TFLOP/s = 98.5 T MAC/s.
* VPU: 8 sublanes x 128 lanes @ ~0.94 GHz ~= 0.96 T op/s (FMA = 1 op), the same
  number the RecConv op analysis used (960 GMAC/s).

compute_bound_ms = max(mxu_ms, vpu_ms) per image — the engines overlap, so the
max is the speed-of-light floor; utilization = bound / measured. Layout ops
(transpose/broadcast/convert) and HBM traffic are excluded: the op-level
analysis showed the RecConv chain is NOT HBM-bound at these shapes, and the gap
to 100% is exactly the relayout/per-op overhead the lane-packing campaign
measured (PERF.md round 2-3).

  python -m recnext_tpu.benchmark.roofline --results bench_results.json
"""

from __future__ import annotations

import argparse
import json
from math import prod
from pathlib import Path

MXU_MAC_PER_S = 98.5e12   # v5e bf16: 197 TFLOP/s
VPU_OP_PER_S = 0.96e12    # 8x128 lanes @ ~0.94 GHz, FMA = 1 op

# pure data-movement / bookkeeping primitives: no ALU work attributed
_FREE = {
    "convert_element_type", "broadcast_in_dim", "transpose", "copy", "reshape",
    "squeeze", "slice", "dynamic_slice", "dynamic_update_slice", "concatenate",
    "rev", "gather", "scatter", "pad", "iota", "stop_gradient", "select_n",
    "reduce_precision", "bitcast_convert_type",
}
# transcendentals cost several VPU ops; everything else elementwise costs 1
_COSTLY = {"erf": 4, "erfc": 4, "exp": 4, "log": 4, "tanh": 4, "logistic": 4,
           "rsqrt": 2, "sqrt": 2, "div": 2, "pow": 8}


def _conv_macs(eqn) -> tuple[float, bool]:
    """(MACs, is_depthwise) for a conv_general_dilated eqn.

    MACs = prod(out) * prod(rhs_spatial) * cin_per_group is exact for every
    conv form XLA emits, including the BACKWARD convs: a depthwise filter-grad
    lowers to a batch-grouped conv (batch_group_count == channels) whose "rhs"
    is the output cotangent. Engine: cin_per_group == 1 means each output
    element reduces over a single input channel — no dense contraction to tile
    onto the MXU — which covers forward depthwise convs (feature_group_count ==
    out_ch) AND their input/filter gradients (batch-grouped per-channel
    correlations); everything else rides the MXU."""
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    kh_kw = [rhs[i] for i in dn.rhs_spec[2:]]
    cin_per_group = rhs[dn.rhs_spec[1]]
    macs = prod(out) * prod(kh_kw) * cin_per_group
    return float(macs), cin_per_group == 1


def _dot_macs(eqn) -> float:
    lhs, rhs = (v.aval.shape for v in eqn.invars)
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = prod(lhs[i] for i in lc)
    b = prod(lhs[i] for i in lb)
    m = prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    n = prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(rb))
    return float(b * m * n * k)


def analyze_jaxpr(jaxpr) -> dict:
    """{mxu_macs, vpu_macs, vpu_elementwise_ops} for a (Closed)Jaxpr, recursing
    through pjit/cond/scan (scan bodies scaled by trip count)."""
    tot = {"mxu_macs": 0.0, "vpu_macs": 0.0, "vpu_elementwise_ops": 0.0}

    def add(dst, src, scale=1.0):
        for k in dst:
            dst[k] += src[k] * scale

    def walk(jx, tot):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None:
                inner = {k: 0.0 for k in tot}
                walk(getattr(sub, "jaxpr", sub), inner)
                add(tot, inner, float(eqn.params.get("length", 1))
                    if name == "scan" else 1.0)
                continue
            if "branches" in eqn.params:  # cond: bound by the costliest branch
                best = {k: 0.0 for k in tot}
                for br in eqn.params["branches"]:
                    inner = {k: 0.0 for k in tot}
                    walk(br.jaxpr, inner)
                    if sum(inner.values()) > sum(best.values()):
                        best = inner
                add(tot, best)
                continue
            if name == "conv_general_dilated":
                macs, dw = _conv_macs(eqn)
                tot["vpu_macs" if dw else "mxu_macs"] += macs
            elif name == "dot_general":
                tot["mxu_macs"] += _dot_macs(eqn)
            elif name in _FREE or not eqn.outvars:
                continue
            elif name.startswith("reduce_") or name in ("argmax", "argmin"):
                # a reduction touches every INPUT element once
                shape = getattr(eqn.invars[0].aval, "shape", ())
                tot["vpu_elementwise_ops"] += prod(shape)
            else:
                shape = getattr(eqn.outvars[0].aval, "shape", ())
                tot["vpu_elementwise_ops"] += prod(shape) * _COSTLY.get(name, 1)

    walk(jaxpr.jaxpr, tot)
    return tot


def model_roofline(model_name: str, image_size: int = 0,
                   batch: int = 256) -> dict:
    """Per-IMAGE engine times + the speed-of-light bound for the deployed fwd
    (BN-fused for the RecNeXt families; the raw LayerNorm model for the MLLA
    grafts, which have no fused form). image_size 0 = the family's native
    resolution (224; MLLA 256)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    if model_name.startswith("mlla"):
        from recnext_tpu.models.mlla import create_mlla

        infer = create_mlla(model_name, dtype=jnp.bfloat16)
        image_size = image_size or infer.cfg.img_size
        x0 = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
        shapes = jax.eval_shape(infer.init, jax.random.PRNGKey(0), x0)
        fv = jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes)
    else:
        from recnext_tpu.fusion import fuse_params
        from recnext_tpu.models.registry import create_model

        image_size = image_size or 224
        model = create_model(model_name, dtype=jnp.bfloat16)
        x0 = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
        variables = jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes)
        fv = fuse_params(variables)
        infer = create_model(model_name, fused=True, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, image_size, image_size, 3), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(lambda v, xx: infer.apply(v, xx, training=False))(fv, x)
    t = analyze_jaxpr(jaxpr)
    mxu_ms = t["mxu_macs"] / MXU_MAC_PER_S / batch * 1e3
    vpu_ms = ((t["vpu_macs"] + t["vpu_elementwise_ops"])
              / VPU_OP_PER_S / batch * 1e3)
    return {
        "model": model_name,
        "mxu_gmacs_per_img": round(t["mxu_macs"] / batch / 1e9, 4),
        "vpu_gmacs_per_img": round(t["vpu_macs"] / batch / 1e9, 4),
        "vpu_gops_elementwise_per_img": round(
            t["vpu_elementwise_ops"] / batch / 1e9, 4),
        "mxu_bound_ms": round(mxu_ms, 4),
        "vpu_bound_ms": round(vpu_ms, 4),
        "compute_bound_ms_per_img": round(max(mxu_ms, vpu_ms), 4),
        "bound_engine": "mxu" if mxu_ms >= vpu_ms else "vpu",
    }


def train_roofline(model_name: str, image_size: int = 0,
                   batch: int = 256) -> dict:
    """Roofline for the FULL train step (fwd+bwd+AdamW+EMA+mixup — the program
    bench.py's train_throughput times): trace the jitted step to a jaxpr and
    classify every primitive like `model_roofline` does for inference. The
    backward convs classify correctly because a depthwise filter-grad lowers to
    a batch-grouped per-channel conv (see _conv_macs) — counting it dense would
    overstate the MXU bound ~25x for a 5x5 dw.

    Also traces the train-mode FORWARD alone so the row carries the fwd/bwd
    engine split (bwd = step - fwd, which lumps the optimizer/EMA elementwise
    tail — a few MB of params, negligible next to the activations)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from recnext_tpu.train.optim import cosine_schedule, make_optimizer
    from recnext_tpu.train.state import TrainState
    from recnext_tpu.train.step import make_train_step

    if model_name.startswith("mlla"):
        from recnext_tpu.models.mlla import create_mlla

        model = create_mlla(model_name, dtype=jnp.bfloat16)
        image_size = image_size or model.cfg.img_size
    else:
        from recnext_tpu.models.registry import create_model

        model = create_model(model_name, dtype=jnp.bfloat16)
        image_size = image_size or 224
    x0 = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    variables = jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes)
    tx = make_optimizer(cosine_schedule(1e-3, 1000))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, num_classes=1000, mixup=True)
    batch_data = {"image": jnp.zeros((batch, image_size, image_size, 3),
                                     jnp.bfloat16),
                  "label": jnp.zeros((batch,), jnp.int32)}
    rng = jax.random.PRNGKey(0)

    tot = analyze_jaxpr(jax.make_jaxpr(step)(state, batch_data, rng))
    # the fwd-alone trace needs the same rng streams the train step wires in
    # (droppath/dropout fire for variants with drop_path > 0, e.g. m4/m5/a4/a5)
    fwd = analyze_jaxpr(jax.make_jaxpr(
        lambda v, xx, r: model.apply(
            v, xx, training=True, mutable=["batch_stats"],
            rngs={"droppath": r, "dropout": r}))(
        variables, batch_data["image"], rng))
    mxu_ms = tot["mxu_macs"] / MXU_MAC_PER_S / batch * 1e3
    vpu_ms = ((tot["vpu_macs"] + tot["vpu_elementwise_ops"])
              / VPU_OP_PER_S / batch * 1e3)
    g = 1e9 * batch
    return {
        "model": model_name,
        "train_mxu_gmacs_per_img": round(tot["mxu_macs"] / g, 4),
        "train_vpu_gmacs_per_img": round(tot["vpu_macs"] / g, 4),
        "train_vpu_gops_elementwise_per_img": round(
            tot["vpu_elementwise_ops"] / g, 4),
        "fwd_mxu_gmacs_per_img": round(fwd["mxu_macs"] / g, 4),
        "fwd_vpu_gmacs_per_img": round(fwd["vpu_macs"] / g, 4),
        "bwd_over_fwd_macs": round(
            (tot["mxu_macs"] + tot["vpu_macs"])
            / max(fwd["mxu_macs"] + fwd["vpu_macs"], 1.0) - 1.0, 3),
        "mxu_bound_ms": round(mxu_ms, 4),
        "vpu_bound_ms": round(vpu_ms, 4),
        "compute_bound_ms_per_img": round(max(mxu_ms, vpu_ms), 4),
        "bound_engine": "mxu" if mxu_ms >= vpu_ms else "vpu",
    }


def main(argv=None):
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=None,
                   help="default: every model in --results (or the registry)")
    p.add_argument("--results", default=None,
                   help="bench_results.json — adds measured ms/img + utilization%")
    p.add_argument("--train", action="store_true",
                   help="roofline the full TRAIN step (fwd+bwd+opt) instead of "
                        "the fused inference forward; --results rows then use "
                        "train_images_per_sec (bench_all --train output)")
    p.add_argument("--image-size", type=int, default=0,
                   help="0 = the family's native resolution (224; MLLA 256)")
    p.add_argument("--out", default=None, help="write rows as JSON")
    args = p.parse_args(argv)

    measured = {}
    if args.results:
        key = "train_images_per_sec" if args.train else "images_per_sec"
        for r in json.loads(Path(args.results).read_text()):
            if key in r:
                measured[r["model"]] = r[key]
    names = args.models
    if not names:
        if measured:
            names = list(measured)
        else:
            from recnext_tpu.models.registry import list_models

            names = list_models()

    rows = []
    for name in names:
        if args.train:
            row = train_roofline(name, image_size=args.image_size)
        else:
            row = model_roofline(name, image_size=args.image_size)
        ips = measured.get(name)
        if ips:
            meas_ms = 1e3 / ips
            row["measured_ms_per_img"] = round(meas_ms, 4)
            row["roofline_utilization_pct"] = round(
                100 * row["compute_bound_ms_per_img"] / meas_ms, 1)
        rows.append(row)
        print(json.dumps(row))
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=2))
    return rows


if __name__ == "__main__":
    main()
