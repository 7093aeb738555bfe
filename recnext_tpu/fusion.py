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
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

EPS = 1e-5  # torch.nn.BatchNorm default


def _np(tree):
    return {k: _np(v) if isinstance(v, dict) else np.asarray(v) for k, v in tree.items()}


def _is_bn(p: Dict, s: Dict | None) -> bool:
    return (
        isinstance(p, dict)
        and set(p.keys()) == {"scale", "bias"}
        and isinstance(s, dict)
        and {"mean", "var"} <= set(s.keys())
    )


def _bn_coeffs(p: Dict, s: Dict):
    w = p["scale"] / np.sqrt(s["var"] + EPS)
    b = p["bias"] - w * s["mean"]
    return w, b


def _fuse_convnorm(p: Dict, s: Dict) -> Dict:
    """{conv:{kernel[,bias]}, norm} -> {conv:{kernel, bias}} (HWIO kernel: scale O axis)."""
    w, b = _bn_coeffs(p["norm"], s["norm"])
    kernel = p["conv"]["kernel"] * w  # broadcasting over last (O) axis
    bias = b + (w * p["conv"]["bias"] if "bias" in p["conv"] else 0.0)
    return {"conv": {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}}


def _fuse_normlinear(p: Dict, s: Dict) -> Dict:
    """{norm, linear:{kernel(in,out)[,bias]}} -> {linear:{kernel, bias}}."""
    w, b = _bn_coeffs(p["norm"], s["norm"])
    kernel = p["linear"]["kernel"] * w[:, None]  # scale input axis
    bias = b @ p["linear"]["kernel"]
    if "bias" in p["linear"]:
        bias = bias + p["linear"]["bias"]
    return {"linear": {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}}


def _fuse_repvggdw(p: Dict, s: Dict) -> Dict:
    """{lk, sk} ConvNorms + identity -> one 3x3 depthwise conv {conv:{kernel,bias}}."""
    lk = _fuse_convnorm(p["lk"], s["lk"])["conv"]
    sk = _fuse_convnorm(p["sk"], s["sk"])["conv"]
    kernel = lk["kernel"].copy()  # (3, 3, 1, C)
    kernel[1, 1] += sk["kernel"][0, 0]
    kernel[1, 1, 0] += 1.0  # identity
    return {"conv": {"kernel": kernel.astype(np.float32),
                     "bias": (lk["bias"] + sk["bias"]).astype(np.float32)}}


def _fuse_classifier(p: Dict, s: Dict) -> Dict:
    """Dual NormLinear heads -> single averaged fused linear."""
    h = _fuse_normlinear(p["head"], s["head"])["linear"]
    hd = _fuse_normlinear(p["head_dist"], s["head_dist"])["linear"]
    return {"head": {"linear": {
        "kernel": ((h["kernel"] + hd["kernel"]) / 2).astype(np.float32),
        "bias": ((h["bias"] + hd["bias"]) / 2).astype(np.float32),
    }}}


def _fuse(p: Dict, s: Dict | None) -> Dict:
    keys = set(p.keys())
    if keys == {"head", "head_dist"}:
        return _fuse_classifier(p, s)
    if keys == {"lk", "sk"}:
        return _fuse_repvggdw(p, s)
    if "conv" in keys and "norm" in keys and _is_bn(p["norm"], (s or {}).get("norm")):
        return _fuse_convnorm(p, s)
    if "norm" in keys and "linear" in keys and _is_bn(p["norm"], (s or {}).get("norm")):
        return _fuse_normlinear(p, s)
    out: Dict = {}
    for k, v in p.items():
        sv = (s or {}).get(k)
        if isinstance(v, dict):
            if _is_bn(v, sv):  # standalone BatchNorm -> FusedAffine
                w, b = _bn_coeffs(v, sv)
                out[k] = {"scale": w.astype(np.float32), "shift": b.astype(np.float32)}
            else:
                out[k] = _fuse(v, sv)
        else:
            out[k] = v
    return out


def fuse_params(variables: Dict[str, Any]) -> Dict[str, Dict]:
    """{params, batch_stats} (train/eval model) -> {params} for the fused=True model."""
    params = _np(variables["params"])
    stats = _np(variables.get("batch_stats", {}))
    return {"params": _fuse(params, stats)}
