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


def _id_stats(ref, xp):
    """Identity-BN running stats shaped like the channel vector `ref`:
    mean=0, var=1-EPS so gamma/sqrt(var+EPS) == gamma EXACTLY."""
    z = xp.zeros_like(xp.asarray(ref, dtype=np.float32))
    return {"mean": z, "var": z + np.float32(1.0 - EPS)}


def _defuse(tp: Dict, fp: Dict, xp):
    """Inverse-embed a fused param subtree into the (template-shaped) unfused
    structure. Returns (params, batch_stats). `tp` is consulted for STRUCTURE
    only (which keys exist), never for values/shapes, so a classifier-head
    class-count change survives to the warm-start merge where mismatched
    leaves are dropped (reference --finetune semantics, main.py:286-291)."""
    keys = set(tp.keys())
    if keys == {"head", "head_dist"} and set(fp.keys()) == {"head"}:
        # averaged fused head -> both dual heads = the average: the fused
        # (deployed) function is preserved exactly and finetuning re-splits them
        lin = fp["head"]["linear"]
        feat = xp.zeros_like(xp.asarray(lin["kernel"], np.float32)[:, 0])
        p = {"norm": {"scale": feat + 1.0, "bias": feat},
             "linear": {"kernel": lin["kernel"], "bias": lin["bias"]}}
        s = {"norm": _id_stats(feat, xp)}
        return ({"head": p, "head_dist": {k: dict(v) for k, v in p.items()}},
                {"head": s, "head_dist": {"norm": _id_stats(feat, xp)}})
    if keys == {"lk", "sk"} and set(fp.keys()) == {"conv"}:
        kernel = xp.asarray(fp["conv"]["kernel"], np.float32)  # (3,3,1,C)
        bias = xp.asarray(fp["conv"]["bias"], np.float32)
        if isinstance(kernel, np.ndarray):
            kernel = kernel.copy()
            kernel[1, 1, 0] -= 1.0  # peel the identity branch back off
        else:
            kernel = kernel.at[1, 1, 0].add(-1.0)
        ch = xp.zeros_like(bias)
        p = {"lk": {"conv": {"kernel": kernel},
                    "norm": {"scale": ch + 1.0, "bias": bias}},
             "sk": {"conv": {"kernel": xp.zeros_like(kernel[:1, :1])},
                    "norm": {"scale": ch + 1.0, "bias": ch}}}
        for br in ("lk", "sk"):  # L-series ConvNorms carry a conv bias
            if "bias" in tp[br]["conv"]:
                p[br]["conv"]["bias"] = ch
        s = {"lk": {"norm": _id_stats(ch, xp)}, "sk": {"norm": _id_stats(ch, xp)}}
        return p, s
    if "conv" in keys and "norm" in keys and set(fp.keys()) == {"conv"}:
        bias = xp.asarray(fp["conv"]["bias"], np.float32)
        conv = {"kernel": fp["conv"]["kernel"]}
        if "bias" in tp["conv"]:
            conv["bias"] = xp.zeros_like(bias)
        p = {"conv": conv,
             "norm": {"scale": xp.zeros_like(bias) + 1.0, "bias": bias}}
        return p, {"norm": _id_stats(bias, xp)}
    if "norm" in keys and "linear" in keys and set(fp.keys()) == {"linear"}:
        lin = fp["linear"]
        feat = xp.zeros_like(xp.asarray(lin["kernel"], np.float32)[:, 0])
        p = {"norm": {"scale": feat + 1.0, "bias": feat},
             "linear": {"kernel": lin["kernel"], "bias": lin["bias"]}}
        return p, {"norm": _id_stats(feat, xp)}
    out_p: Dict = {}
    out_s: Dict = {}
    for k, v in tp.items():
        fv = fp.get(k) if isinstance(fp, dict) else None
        if isinstance(v, dict):
            if set(v.keys()) == {"scale", "bias"} and isinstance(fv, dict) \
                    and set(fv.keys()) == {"scale", "shift"}:
                # FusedAffine -> standalone BatchNorm with identity stats
                out_p[k] = {"scale": fv["scale"], "bias": fv["shift"]}
                out_s[k] = _id_stats(fv["scale"], xp)
            elif isinstance(fv, dict):
                out_p[k], sub_s = _defuse(v, fv, xp)
                if sub_s:
                    out_s[k] = sub_s
            else:
                out_p[k] = v  # missing in the fused ckpt: keep template init
        else:
            out_p[k] = fv if fv is not None else v
    return out_p, out_s


def defuse_params(fused_params: Dict[str, Any], template_variables: Dict[str, Any],
                  xp=np) -> Dict[str, Dict]:
    """Embed a fused parameter tree back into the UNFUSED (trainable) model:
    every folded BatchNorm comes back as an identity BN (gamma=1, beta=fused
    bias, mean=0, var=1-eps) so `fuse_params(defuse_params(f)) == f` exactly
    and the unfused model computes the same function at step 0 — the warm-start
    path for finetuning from a published deployment artifact (`*_fused.pt`,
    /root/reference/publish.py:28-42). The template supplies structure only;
    leaf values/shapes come from the fused tree (head-shape mismatches are
    resolved later by the finetune merge)."""
    tp = _plain(template_variables["params"])
    fp = _np(fused_params) if xp is np else _plain(fused_params)
    params, stats = _defuse(tp, fp, xp)
    return {"params": params, "batch_stats": stats}


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
