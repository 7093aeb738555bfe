"""BatchNorm fusion as a pure parameter transform over the Flax pytree.

`fuse_params({params, batch_stats})` returns the parameter tree for the same model
constructed with `fused=True`. This is the functional counterpart of the reference's
recursive module surgery (`fuse_children`, /root/reference/model/recnext.py:276-287;
`utils.replace_batchnorm`, /root/reference/utils.py:227-234) with identical math:

* ConvNorm:  w' = gamma/sqrt(var+eps) * w,  b' = beta - gamma*mu/sqrt(var+eps) (+ folded
  conv bias), /root/reference/model/recnext.py:75-97.
* NormLinear: input-side BN folded into the linear, /root/reference/model/recnext.py:109-122.
* RepVGGDW:  fused lk + padded sk + identity into one 3x3 DW conv,
  /root/reference/lsnet/model/recattn.py:17-34.
* Classifier: the two fused heads averaged into one, /root/reference/model/recnext.py:191-201.
* Standalone BN (block/downsample `norm`): kept as an affine (the torch fuse also keeps
  nn.BatchNorm2d modules since they expose no .fuse()), emitted as FusedAffine params.

The transform is backend-parametric: `fuse_params(variables)` runs on host numpy
(export/convert/bench paths), while `fuse_params(variables, xp=jax.numpy)` is
jit-traceable — the fold becomes a handful of elementwise ops INSIDE the compiled
program, which is how the trainer's fused eval step avoids any host round-trip
(device_get of a full param tree over the axon tunnel costs minutes, PERF.md).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

EPS = 1e-5  # torch.nn.BatchNorm default


def _np(tree):
    return {k: _np(v) if isinstance(v, dict) else np.asarray(v) for k, v in tree.items()}


def _plain(tree):
    """Plain nested dicts, leaves untouched (FrozenDict-safe, tracer-safe)."""
    if hasattr(tree, "items"):
        return {k: _plain(v) for k, v in tree.items()}
    return tree


def _is_bn(p: Dict, s: Dict | None) -> bool:
    return (
        isinstance(p, dict)
        and set(p.keys()) == {"scale", "bias"}
        and isinstance(s, dict)
        and {"mean", "var"} <= set(s.keys())
    )


def _bn_coeffs(p: Dict, s: Dict, xp):
    w = p["scale"] / xp.sqrt(s["var"] + EPS)
    b = p["bias"] - w * s["mean"]
    return w, b


def _fuse_convnorm(p: Dict, s: Dict, xp) -> Dict:
    """{conv:{kernel[,bias]}, norm} -> {conv:{kernel, bias}} (HWIO kernel: scale O axis)."""
    w, b = _bn_coeffs(p["norm"], s["norm"], xp)
    kernel = p["conv"]["kernel"] * w  # broadcasting over last (O) axis
    bias = b + (w * p["conv"]["bias"] if "bias" in p["conv"] else 0.0)
    return {"conv": {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}}


def _fuse_normlinear(p: Dict, s: Dict, xp) -> Dict:
    """{norm, linear:{kernel(in,out)[,bias]}} -> {linear:{kernel, bias}}."""
    w, b = _bn_coeffs(p["norm"], s["norm"], xp)
    kernel = p["linear"]["kernel"] * w[:, None]  # scale input axis
    bias = b @ p["linear"]["kernel"]
    if "bias" in p["linear"]:
        bias = bias + p["linear"]["bias"]
    return {"linear": {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}}


def _fuse_repvggdw(p: Dict, s: Dict, xp) -> Dict:
    """{lk, sk} ConvNorms + identity -> one 3x3 depthwise conv {conv:{kernel,bias}}."""
    lk = _fuse_convnorm(p["lk"], s["lk"], xp)["conv"]
    sk = _fuse_convnorm(p["sk"], s["sk"], xp)["conv"]
    kernel = lk["kernel"]  # (3, 3, 1, C)
    if isinstance(kernel, np.ndarray):
        kernel = kernel.copy()
        kernel[1, 1] += sk["kernel"][0, 0]
        kernel[1, 1, 0] += 1.0  # identity
    else:  # jax arrays/tracers are immutable: functional .at updates
        kernel = kernel.at[1, 1].add(sk["kernel"][0, 0])
        kernel = kernel.at[1, 1, 0].add(1.0)  # identity
    return {"conv": {"kernel": kernel.astype(np.float32),
                     "bias": (lk["bias"] + sk["bias"]).astype(np.float32)}}


def _fuse_classifier(p: Dict, s: Dict, xp) -> Dict:
    """Dual NormLinear heads -> single averaged fused linear."""
    h = _fuse_normlinear(p["head"], s["head"], xp)["linear"]
    hd = _fuse_normlinear(p["head_dist"], s["head_dist"], xp)["linear"]
    return {"head": {"linear": {
        "kernel": ((h["kernel"] + hd["kernel"]) / 2).astype(np.float32),
        "bias": ((h["bias"] + hd["bias"]) / 2).astype(np.float32),
    }}}


def _fuse(p: Dict, s: Dict | None, xp) -> Dict:
    keys = set(p.keys())
    if keys == {"head", "head_dist"}:
        return _fuse_classifier(p, s, xp)
    if keys == {"lk", "sk"}:
        return _fuse_repvggdw(p, s, xp)
    if "conv" in keys and "norm" in keys and _is_bn(p["norm"], (s or {}).get("norm")):
        return _fuse_convnorm(p, s, xp)
    if "norm" in keys and "linear" in keys and _is_bn(p["norm"], (s or {}).get("norm")):
        return _fuse_normlinear(p, s, xp)
    out: Dict = {}
    for k, v in p.items():
        sv = (s or {}).get(k)
        if isinstance(v, dict):
            if _is_bn(v, sv):  # standalone BatchNorm -> FusedAffine
                w, b = _bn_coeffs(v, sv, xp)
                out[k] = {"scale": w.astype(np.float32), "shift": b.astype(np.float32)}
            else:
                out[k] = _fuse(v, sv, xp)
        else:
            out[k] = v
    return out


def fuse_params(variables: Dict[str, Any], xp=np) -> Dict[str, Dict]:
    """{params, batch_stats} (train/eval model) -> {params} for the fused=True model.

    xp=numpy (default): host-side, leaves materialized as np arrays.
    xp=jax.numpy: traceable — call it inside jit on device-resident (possibly
    sharded) variables; the fold compiles into the surrounding program."""
    if xp is np:
        params = _np(variables["params"])
        stats = _np(variables.get("batch_stats", {}))
    else:
        params = _plain(variables["params"])
        stats = _plain(variables.get("batch_stats", {}))
    return {"params": _fuse(params, stats, xp)}
