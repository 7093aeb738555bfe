"""PyTorch checkpoint -> Flax pytree converter.

Translates a reference RecNext state dict (any family, /root/reference/model/recnext.py,
model/recattn.py, lsnet/model/recattn.py) into the {params, batch_stats} pytrees of
recnext_tpu.models.recnext.RecNext. The mapping is a deterministic token rewrite of the
torch dotted path plus leaf transforms:

* conv weight  OIHW -> HWIO transpose (group-major channel order is identical between
  torch grouped conv and lax feature_group_count, so no channel permutation is needed)
* linear weight (out, in) -> (in, out)
* BN weight/bias/running_mean/running_var -> scale/bias (params) + mean/var (batch_stats)

Accepts checkpoints wrapped as {'model': ...} / {'state_dict': ...} and strips
'module.'/'backbone.' prefixes, mirroring the tolerant loaders in
/root/reference/detection/recnext.py:234-263.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _unwrap(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    for key in ("model", "state_dict", "model_ema"):
        if key in state and isinstance(state[key], Mapping):
            state = state[key]
            break
    out = {}
    for k, v in state.items():
        for pre in ("module.", "backbone."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(getattr(v, "numpy", lambda: v)())
    return out


_STEM = {"0": "conv1", "2": "conv2", "4": "conv3"}


def _walk_structure(toks: list[str]) -> list[str]:
    """Shared torch->flax STRUCTURAL token rewrite (stem / stages / mixers /
    RecConv kernels), used by both the unfused (_map_key) and fused
    (torch_fused_to_flax) walkers so the grammar lives in exactly one place."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "stem" and i + 1 < len(toks) and toks[i + 1] == "stem":
            out += ["stem", _STEM[toks[i + 2]]]
            i += 3
            continue
        if t == "stages":
            idx = toks[i + 1]
            if toks[i + 2] == "downsample":
                out.append(f"downsample_{idx}")
                i += 3
            else:
                assert toks[i + 2] == "blocks", toks
                out.append(f"stage{idx}_block{toks[i + 3]}")
                i += 4
            continue
        if t == "channel_mixer":
            out += ["channel_mixer", {"0": "fc1", "2": "fc2"}[toks[i + 1]]]
            i += 2
            continue
        if t == "down" and i + 1 < len(toks) and toks[i + 1] in ("0", "1"):
            # RecAttn2d down Sequential: 0 = ConvNorm, 1 = LinearAttention
            out.append("down" if toks[i + 1] == "0" else "attn")
            i += 2
            continue
        if (t == "token_mixer" and i + 2 < len(toks) and toks[i + 1] == "down"
                and toks[i + 2] in ("weight", "bias")):
            # M-series RecConv2d shared stride-2 down conv
            out += ["token_mixer",
                    "down_kernel" if toks[i + 2] == "weight" else "down_bias"]
            i += 3
            continue
        if t == "token_mixer" and i + 1 < len(toks) and toks[i + 1] == "attn":
            # L-series PartialChannelOperation(attn): params live at block scope
            out.append("attn")
            i += 2
            continue
        if t == "convs":
            # M-series RecConv2d convs.{k}.weight -> conv{k}_kernel
            leaf = toks[i + 2]
            out.append(f"conv{toks[i + 1]}_{'kernel' if leaf == 'weight' else 'bias'}")
            i += 3
            continue
        out.append(t)
        i += 1
    return out


def _map_key(key: str) -> Tuple[Tuple[str, ...], str, str] | None:
    """torch dotted key -> (flax path tuple, collection, transform).

    transform in {"conv", "linear", "id"}; collection in {"params", "batch_stats"}.
    Returns None for keys to skip (num_batches_tracked).
    """
    if key.endswith("num_batches_tracked"):
        return None
    out = _walk_structure(key.split("."))

    # Leaf handling
    leaf = out[-1]
    parent = out[-2] if len(out) >= 2 else ""
    if leaf in ("down_kernel", "down_bias"):
        return tuple(out), "params", "conv" if leaf == "down_kernel" else "id"
    if leaf.startswith("conv") and leaf.endswith(("_kernel", "_bias")):
        tr = "conv" if leaf.endswith("_kernel") else "id"
        return tuple(out), "params", tr
    if parent == "norm":
        if leaf == "weight":
            return tuple(out[:-1] + ["scale"]), "params", "id"
        if leaf == "bias":
            return tuple(out), "params", "id"
        if leaf == "running_mean":
            return tuple(out[:-1] + ["mean"]), "batch_stats", "id"
        if leaf == "running_var":
            return tuple(out[:-1] + ["var"]), "batch_stats", "id"
    if parent == "conv":
        if leaf == "weight":
            return tuple(out[:-1] + ["kernel"]), "params", "conv"
        return tuple(out), "params", "id"
    if parent == "linear":
        if leaf == "weight":
            return tuple(out[:-1] + ["kernel"]), "params", "linear"
        return tuple(out), "params", "id"
    if parent == "token_mixer" and leaf in ("weight", "bias"):
        # M/A Downsample raw conv token mixer
        return tuple(out[:-1] + ["kernel" if leaf == "weight" else "bias"]), "params", (
            "conv" if leaf == "weight" else "id"
        )
    raise KeyError(f"unmapped torch key: {'.'.join(out)} (from {parent}.{leaf})")


def _transform(v: np.ndarray, tr: str) -> np.ndarray:
    if tr == "conv":
        return np.transpose(v, (2, 3, 1, 0))
    if tr == "linear":
        return np.transpose(v, (1, 0))
    return v


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax(state: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert a torch state dict (tensors or ndarrays) to {params, batch_stats}."""
    flat = _unwrap(state)
    params: Dict = {}
    stats: Dict = {}
    for k, v in flat.items():
        mapped = _map_key(k)
        if mapped is None:
            continue
        path, col, tr = mapped
        _set(params if col == "params" else stats, path, _transform(v, tr).astype(np.float32))
    return {"params": params, "batch_stats": stats}


def torch_fused_to_flax(state: Mapping[str, Any], family: str = "m") -> Dict[str, Dict]:
    """Convert a torch-side BN-fused checkpoint (the published `*_fused.pt` layout
    produced by /root/reference/publish.py:28-42 — ConvNorm/NormLinear/RepVGGDW
    replaced by plain Conv2d/Linear, standalone BatchNorms kept) into the params of
    our fused=True model (ConvNorm -> conv/kernel+bias, standalone BN ->
    FusedAffine scale/shift, single averaged classifier head)."""
    flat = _unwrap(state)
    params: Dict = {}
    eps = 1e-5

    def rewrite(key: str) -> list[str]:
        return _walk_structure(key.split("."))  # shared grammar (_map_key)

    # standalone BN -> FusedAffine
    bn_prefixes = {k[: -len(".running_mean")] for k in flat if k.endswith(".running_mean")}
    for p in bn_prefixes:
        w = flat[f"{p}.weight"]
        b = flat[f"{p}.bias"]
        mean = flat[f"{p}.running_mean"]
        var = flat[f"{p}.running_var"]
        scale = w / np.sqrt(var + eps)
        path = rewrite(p)
        _set(params, tuple(path + ["scale"]), scale.astype(np.float32))
        _set(params, tuple(path + ["shift"]), (b - scale * mean).astype(np.float32))

    handled = {f"{p}.{s}" for p in bn_prefixes
               for s in ("weight", "bias", "running_mean", "running_var",
                         "num_batches_tracked")}
    for k, v in flat.items():
        if k in handled or k.endswith("num_batches_tracked"):
            continue
        out = rewrite(k)
        leaf = out[-1]
        if leaf.endswith(("_kernel", "_bias")):  # RecConv params
            tr = "conv" if leaf.endswith("_kernel") else "id"
            _set(params, tuple(out), _transform(v, tr).astype(np.float32))
            continue
        if out[0] == "head" and leaf in ("weight", "bias"):
            # fused classifier: single Linear under head/head/linear
            name = "kernel" if leaf == "weight" else "bias"
            tr = "linear" if leaf == "weight" else "id"
            _set(params, ("head", "head", "linear", name),
                 _transform(v, tr).astype(np.float32))
            continue
        # M/A Downsample token_mixer is a raw Conv2d in both models (no inner "conv")
        raw_conv = (family in ("m", "a") and len(out) >= 2
                    and out[-2] == "token_mixer" and out[0].startswith("downsample"))
        if leaf == "weight" and v.ndim == 4:
            dest = ["kernel"] if raw_conv else ["conv", "kernel"]
            _set(params, tuple(out[:-1] + dest), _transform(v, "conv").astype(np.float32))
            continue
        if leaf == "bias":
            sib = flat.get(k[: -len("bias")] + "weight")
            if sib is not None and sib.ndim == 4:
                dest = ["bias"] if raw_conv else ["conv", "bias"]
                _set(params, tuple(out[:-1] + dest), v.astype(np.float32))
                continue
        raise KeyError(f"unmapped fused torch key: {k}")
    return {"params": params}


_MLLA_STEM = {"conv1": ["conv1"], "conv2.0": ["conv2_0"], "conv2.1": ["conv2_1"],
              "conv3.0": ["conv3_0"], "conv3.1": ["conv3_1"]}


def _map_key_mlla(key: str):
    """torch MLLA key -> (flax path, collection, transform); None to skip.

    Module naming: recnext_tpu/models/mlla.py (stem/convX, layer{i}_block{j},
    layer{i}_down, norm, head)."""
    if key.endswith("num_batches_tracked") or key.endswith("rope.rotations"):
        return None
    toks = key.split(".")
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "patch_embed":
            sub = ".".join(toks[i + 1 : i + 3])
            if sub in _MLLA_STEM:
                out += ["stem"] + _MLLA_STEM[sub]
                i += 3
            else:
                out += ["stem", toks[i + 1]]
                i += 2
            continue
        if t == "layers":
            li = toks[i + 1]
            if toks[i + 2] == "blocks":
                out.append(f"layer{li}_block{toks[i + 3]}")
                i += 4
            else:  # downsample
                out.append(f"layer{li}_down")
                i += 3
            continue
        if t == "agg" and i + 2 < len(toks) and toks[i + 1] == "down" and \
                toks[i + 2] in ("weight", "bias"):
            # recconv aggregator's shared stride-2 down conv
            out += ["agg", "down_kernel" if toks[i + 2] == "weight" else "down_bias"]
            i += 3
            continue
        if t == "down" and i + 1 < len(toks) and toks[i + 1] in ("0", "1"):
            out.append("down" if toks[i + 1] == "0" else "attn")
            i += 2
            continue
        if t == "convs":
            leaf = toks[i + 2]
            out.append(f"conv{toks[i + 1]}_{'kernel' if leaf == 'weight' else 'bias'}")
            i += 3
            continue
        if t == "mlp":
            out.append(f"mlp_{toks[i + 1]}")
            i += 2
            continue
        out.append(t)
        i += 1

    leaf, parent = out[-1], out[-2] if len(out) >= 2 else ""
    linear_parents = {"i_proj", "mlp_fc1", "mlp_fc2", "head"}
    conv_parents = {"cpe1", "cpe2", "o_proj", "qk", "pe", "lepe", "down", "conv"}
    ln_parents = {"norm1", "norm2", "norm"}
    if leaf.endswith(("_kernel", "_bias")) and (leaf.startswith("conv") or leaf.startswith("down")):
        return tuple(out), "params", "conv" if leaf.endswith("_kernel") else "id"
    if parent == "bn" or (parent == "norm" and ("stem" in out)):
        # ConvLayer BatchNorm (flax name: "bn")
        base = out[:-2] + ["bn"]
        if leaf == "weight":
            return tuple(base + ["scale"]), "params", "id"
        if leaf == "bias":
            return tuple(base + ["bias"]), "params", "id"
        if leaf == "running_mean":
            return tuple(base + ["mean"]), "batch_stats", "id"
        if leaf == "running_var":
            return tuple(base + ["var"]), "batch_stats", "id"
    if parent in ln_parents:
        return tuple(out[:-1] + ["scale" if leaf == "weight" else "bias"]), "params", "id"
    if parent in conv_parents:
        return tuple(out[:-1] + ["kernel" if leaf == "weight" else "bias"]), "params", (
            "conv" if leaf == "weight" else "id")
    if parent in linear_parents:
        return tuple(out[:-1] + ["kernel" if leaf == "weight" else "bias"]), "params", (
            "linear" if leaf == "weight" else "id")
    raise KeyError(f"unmapped MLLA torch key: {key} -> {'.'.join(out)}")


def mlla_torch_to_flax(state: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert a reference MLLA state dict (any of the three variants)."""
    flat = _unwrap(state)
    params: Dict = {}
    stats: Dict = {}
    for k, v in flat.items():
        mapped = _map_key_mlla(k)
        if mapped is None:
            continue
        path, col, tr = mapped
        _set(params if col == "params" else stats, path, _transform(v, tr).astype(np.float32))
    return {"params": params, "batch_stats": stats}


def _map_key_regnety(key: str):
    """timm RegNetY state-dict key -> (flax path, collection, transform).

    timm layout (the DeiT regnety_160 teacher checkpoint, main.py:336-352):
    stem.conv/bn, s{i}.b{j}.conv{1,2,3}.{conv,bn}, s{i}.b{j}.se.fc{1,2},
    s{i}.b{j}.downsample.{conv,bn}, head.fc. Ours: stem/..., s{i}_b{j}/...,
    head_fc, with ConvNorm's BN submodule named 'norm'.
    """
    if key.endswith("num_batches_tracked"):
        return None
    toks = key.split(".")
    leaf = toks[-1]
    out: list = []
    i = 0
    while i < len(toks) - 1:
        t = toks[i]
        if t.startswith("s") and t[1:].isdigit() and i + 1 < len(toks) \
                and toks[i + 1].startswith("b") and toks[i + 1][1:].isdigit():
            out.append(f"{t}_{toks[i + 1]}")
            i += 2
            continue
        if t == "bn":
            out.append("norm")
            i += 1
            continue
        if t == "head" and toks[i + 1] == "fc":
            out.append("head_fc")
            i += 2
            continue
        out.append(t)
        i += 1
    parent = out[-1] if out else ""
    if parent == "norm":
        col = {"weight": ("params", "scale"), "bias": ("params", "bias"),
               "running_mean": ("batch_stats", "mean"),
               "running_var": ("batch_stats", "var")}[leaf]
        return tuple(out + [col[1]]), col[0], "id"
    if parent in ("conv", "fc1", "fc2"):
        return tuple(out + ["kernel" if leaf == "weight" else "bias"]), "params", (
            "conv" if leaf == "weight" else "id")
    if parent == "head_fc":
        return tuple(out + ["kernel" if leaf == "weight" else "bias"]), "params", (
            "linear" if leaf == "weight" else "id")
    raise KeyError(f"unmapped RegNetY torch key: {key}")


def regnety_torch_to_flax(state: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert a timm RegNetY state dict (e.g. the published regnety_160 DeiT
    teacher) to recnext_tpu.models.regnet.RegNetY {params, batch_stats}."""
    flat = _unwrap(state)
    params: Dict = {}
    stats: Dict = {}
    for k, v in flat.items():
        mapped = _map_key_regnety(k)
        if mapped is None:
            continue
        path, col, tr = mapped
        _set(params if col == "params" else stats, path,
             _transform(v, tr).astype(np.float32))
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, Dict]:
    """Load a .pth checkpoint file and convert (CPU-only torch load)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return torch_to_flax(state)


# ---------------------------------------------------------------------------
# Reverse direction: flax -> torch state dicts.
#
# Lets a TPU-trained checkpoint flow back into the reference's torch ecosystem
# (fuse_eval.py, publish.py, export_coreml.py, the mm deploy tools). The torch
# key layout is the reference's (/root/reference/model/recnext.py module tree;
# published-fused layout per publish.py:28-42); correctness is enforced at
# runtime by round-tripping the produced dict through the golden-tested forward
# converters above and asserting exact tree equality.
# ---------------------------------------------------------------------------

import re as _re

_STEM_INV = {"conv1": "0", "conv2": "2", "conv3": "4"}
_BLOCK_RE = _re.compile(r"stage(\d+)_block(\d+)")
_DS_RE = _re.compile(r"downsample_(\d+)")
_CONVK_RE = _re.compile(r"conv(\d+)_(kernel|bias)")
_DOWNKB_RE = _re.compile(r"down_(kernel|bias)")


def _flatten_tree(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], np.ndarray]:
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _inv_path(path: Tuple[str, ...]) -> Tuple[list, str]:
    """Invert the _map_key token rewrite: flax path tuple -> torch dotted tokens.

    Returns (tokens, transform) where transform is set for leaves the token
    rewrite itself resolves (RecConv convK_/down_ leaves); everything else is
    resolved by the caller's leaf rules."""
    toks: list = []
    tr = "id"
    for i, t in enumerate(path):
        prev = path[i - 1] if i else ""
        m = _BLOCK_RE.fullmatch(t)
        if m:
            toks += ["stages", m.group(1), "blocks", m.group(2)]
            continue
        m = _DS_RE.fullmatch(t)
        if m:
            toks += ["stages", m.group(1), "downsample"]
            continue
        if t == "stem" and i == 0:
            toks += ["stem", "stem"]
            continue
        if prev == "stem" and i == 1 and t in _STEM_INV:
            toks.append(_STEM_INV[t])
            continue
        if prev == "channel_mixer" and t in ("fc1", "fc2"):
            toks.append("0" if t == "fc1" else "2")
            continue
        m = _CONVK_RE.fullmatch(t)
        if m:
            toks += ["convs", m.group(1), "weight" if m.group(2) == "kernel" else "bias"]
            tr = "conv" if m.group(2) == "kernel" else "id"
            continue
        m = _DOWNKB_RE.fullmatch(t)
        if m:
            toks += ["down", "weight" if m.group(1) == "kernel" else "bias"]
            tr = "conv" if m.group(1) == "kernel" else "id"
            continue
        if t == "attn":
            # block-scope attn = L-series PartialChannelOperation(attn);
            # nested attn = LinearAttention at RecAttn2d down.1
            toks += (["token_mixer", "attn"] if _BLOCK_RE.fullmatch(prev)
                     else ["down", "1"])
            continue
        if t == "down":
            toks += ["down", "0"]
            continue
        toks.append(t)
    return toks, tr


_NORM_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean",
              "var": "running_var"}


def _inv_leaf(path: Tuple[str, ...], fused: bool) -> Tuple[str, str]:
    """flax leaf path -> (torch key, transform)."""
    toks, tr = _inv_path(path)
    leaf, parent = path[-1], path[-2] if len(path) >= 2 else ""
    if _CONVK_RE.fullmatch(leaf) or _DOWNKB_RE.fullmatch(leaf):
        return ".".join(toks), tr
    if parent == "norm" and leaf in _NORM_LEAF:
        toks[-1] = _NORM_LEAF[leaf]
        return ".".join(toks), "id"
    if parent == "conv" and leaf in ("kernel", "bias"):
        name = "weight" if leaf == "kernel" else "bias"
        if fused:  # ConvNorm -> plain Conv2d: no inner .conv module
            toks[-2:] = [name]
        else:
            toks[-1] = name
        return ".".join(toks), "conv" if leaf == "kernel" else "id"
    if parent == "linear" and leaf in ("kernel", "bias"):
        name = "weight" if leaf == "kernel" else "bias"
        if fused and path[0] == "head":
            # fused single averaged classifier head -> plain Linear "head"
            return f"head.{name}", "linear" if leaf == "kernel" else "id"
        toks[-1] = name
        return ".".join(toks), "linear" if leaf == "kernel" else "id"
    if parent == "token_mixer" and leaf in ("kernel", "bias"):
        # M/A Downsample raw conv token mixer
        toks[-1] = "weight" if leaf == "kernel" else "bias"
        return ".".join(toks), "conv" if leaf == "kernel" else "id"
    raise KeyError(f"unmapped flax path: {'/'.join(path)}")


def _inv_transform(v: np.ndarray, tr: str) -> np.ndarray:
    if tr == "conv":
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
    if tr == "linear":
        return np.transpose(v, (1, 0))
    return v


def _assert_tree_equal(a: Mapping, b: Mapping, what: str):
    fa, fb = _flatten_tree(a), _flatten_tree(b)
    if set(fa) != set(fb):
        missing = sorted("/".join(p) for p in set(fb) - set(fa))
        extra = sorted("/".join(p) for p in set(fa) - set(fb))
        raise AssertionError(f"{what}: tree mismatch; missing={missing[:5]} extra={extra[:5]}")
    for p in fa:
        if not np.array_equal(fa[p], np.asarray(fb[p], fa[p].dtype)):
            raise AssertionError(f"{what}: value mismatch at {'/'.join(p)}")


def flax_to_torch(variables: Mapping[str, Any], *, verify: bool = True) -> Dict[str, np.ndarray]:
    """Flax {params, batch_stats} -> reference torch state dict (unfused layout,
    /root/reference/model/recnext.py module tree). Values are float32 ndarrays;
    wrap with torch.from_numpy (or use save_torch_checkpoint) to load into the
    reference model with strict=True.

    verify=True (default) round-trips the result through torch_to_flax and
    asserts exact tree equality with the input — any inversion error raises
    here rather than producing a silently-wrong checkpoint."""
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    if not params:
        raise ValueError("flax_to_torch expects {'params': ..., 'batch_stats': ...} "
                         "(got no 'params' collection)")
    out: Dict[str, np.ndarray] = {}
    for path, v in _flatten_tree(params).items():
        key, tr = _inv_leaf(path, fused=False)
        out[key] = np.ascontiguousarray(_inv_transform(v.astype(np.float32), tr))
    for path, v in _flatten_tree(stats).items():
        key, _ = _inv_leaf(path, fused=False)
        out[key] = v.astype(np.float32)
        if path[-1] == "mean":  # torch BN buffers include num_batches_tracked
            out[key.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.zeros((), np.int64)
    if verify:
        rt = torch_to_flax(out)
        _assert_tree_equal(rt["params"], params, "flax_to_torch params")
        _assert_tree_equal(rt["batch_stats"], stats, "flax_to_torch batch_stats")
    return out


def flax_fused_to_torch(params: Mapping[str, Any], family: str = "m", *,
                        verify: bool = True) -> Dict[str, np.ndarray]:
    """Fused flax params (fuse_params output / published artifact) -> the
    published torch-fused state dict layout (/root/reference/publish.py:28-42:
    plain Conv2d/Linear, standalone BatchNorms kept, single classifier head).

    Our FusedAffine(scale, shift) becomes an equivalent standalone BN with
    weight=scale, bias=shift, running_mean=0, running_var=1-eps — numerically
    exact under torch's eps=1e-5 normalization."""
    if "params" in params and isinstance(params["params"], Mapping):
        params = params["params"]
    if not params:
        raise ValueError("flax_fused_to_torch got an empty params tree")
    eps = 1e-5
    out: Dict[str, np.ndarray] = {}
    for path, v in _flatten_tree(dict(params)).items():
        if path[-2:] == ("norm", "shift"):
            continue  # handled with its scale sibling
        if path[-2:] == ("norm", "scale"):
            toks, _ = _inv_path(path[:-1])
            prefix = ".".join(toks)
            scale = v.astype(np.float32)
            node = params
            for p in path[:-1]:
                node = node[p]
            shift = np.asarray(node["shift"], np.float32)
            out[f"{prefix}.weight"] = scale
            out[f"{prefix}.bias"] = shift
            out[f"{prefix}.running_mean"] = np.zeros_like(scale)
            out[f"{prefix}.running_var"] = np.full_like(scale, 1.0 - eps)
            out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)
            continue
        key, tr = _inv_leaf(path, fused=True)
        out[key] = np.ascontiguousarray(_inv_transform(v.astype(np.float32), tr))
    if verify:
        rt = torch_fused_to_flax(out, family=family)
        _assert_tree_equal(rt["params"], dict(params), "flax_fused_to_torch")
    return out


_MLLA_TOKEN_INV = {
    "conv2_0": ["conv2.0"], "conv2_1": ["conv2.1"],
    "conv3_0": ["conv3.0"], "conv3_1": ["conv3.1"],
    "mlp_fc1": ["mlp.fc1"], "mlp_fc2": ["mlp.fc2"],
    # ambiguous tokens: every option is tried and verified against the forward
    # mapper, so ordering is just a fast path ("bn" is context-ordered inline)
    "attn": ["down.1", "attn"],
    "down": ["down.0", "down"],
}
_MLLA_LEAF_INV = {"kernel": "weight", "bias": "bias", "scale": "weight",
                  "mean": "running_mean", "var": "running_var"}


def _mlla_inv_leaf(path: Tuple[str, ...], col: str) -> Tuple[str, str]:
    """Invert _map_key_mlla for one flax leaf path by candidate generation:
    every ambiguous token yields options, each full candidate torch key is
    verified by running the FORWARD mapper and requiring it to map back to
    exactly this path/collection — so a wrong guess cannot survive."""
    import itertools

    options: list = []
    for i, t in enumerate(path):
        if i == 0 and t == "stem":
            options.append(["patch_embed"])
            continue
        m = _re.fullmatch(r"layer(\d+)_block(\d+)", t)
        if m:
            options.append([f"layers.{m.group(1)}.blocks.{m.group(2)}"])
            continue
        m = _re.fullmatch(r"layer(\d+)_down", t)
        if m:
            options.append([f"layers.{m.group(1)}.downsample"])
            continue
        m = _CONVK_RE.fullmatch(t)
        if m:
            options.append([f"convs.{m.group(1)}."
                            f"{'weight' if m.group(2) == 'kernel' else 'bias'}"])
            continue
        m = _DOWNKB_RE.fullmatch(t)
        if m:
            options.append([f"down.{'weight' if m.group(1) == 'kernel' else 'bias'}"])
            continue
        if i == len(path) - 1 and t in _MLLA_LEAF_INV:
            options.append([_MLLA_LEAF_INV[t]])
            continue
        if t == "bn":
            # the forward mapper accepts both spellings (so both would verify);
            # the reference models use "norm" inside the stem ConvLayers and
            # "bn" elsewhere — order decides which valid key we emit
            options.append(["norm", "bn"] if "stem" in path else ["bn", "norm"])
            continue
        options.append(_MLLA_TOKEN_INV.get(t, [t]))
    for combo in itertools.product(*options):
        key = ".".join(combo)
        mapped = _map_key_mlla(key)
        if mapped is not None and mapped[0] == path and mapped[1] == col:
            return key, mapped[2]
    raise KeyError(f"no torch key found for MLLA flax path {'/'.join(path)} ({col})")


def mlla_flax_to_torch(variables: Mapping[str, Any], *, verify: bool = True) -> Dict[str, np.ndarray]:
    """Flax MLLA {params, batch_stats} -> reference torch state dict
    (/root/reference/mlla/models/* module tree). The produced dict omits the
    deterministic `rope.rotations` buffers (the forward mapper skips them; a
    freshly constructed torch model already holds the correct values), so load
    with strict=False and check the only missing keys are rope buffers."""
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    if not params:
        raise ValueError("mlla_flax_to_torch expects {'params': ..., 'batch_stats': ...}")
    out: Dict[str, np.ndarray] = {}
    for col, tree in (("params", params), ("batch_stats", stats)):
        for path, v in _flatten_tree(tree).items():
            key, tr = _mlla_inv_leaf(path, col)
            out[key] = np.ascontiguousarray(_inv_transform(v.astype(np.float32), tr))
            if col == "batch_stats" and path[-1] == "mean":
                out[key.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.zeros((), np.int64)
    if verify:
        rt = mlla_torch_to_flax(out)
        _assert_tree_equal(rt["params"], params, "mlla_flax_to_torch params")
        _assert_tree_equal(rt["batch_stats"], stats, "mlla_flax_to_torch batch_stats")
    return out


def save_torch_checkpoint(state: Mapping[str, np.ndarray], path: str) -> None:
    """Write a reverse-converted state dict as a reference-loadable .pth
    ({'model': state_dict} wrapping, matching main.py's checkpoint format)."""
    import torch

    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in state.items()}}, path)
