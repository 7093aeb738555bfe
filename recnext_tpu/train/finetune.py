"""Finetune / transfer-learning warm start: model-weights-only checkpoint load.

Counterpart of the reference's `--finetune` path (/root/reference/main.py:145-146,
278-294): load ONLY the model weights (no optimizer/schedule/epoch), drop any
leaf whose shape mismatches the freshly-initialized model — the reference drops
exactly the classifier-head leaves (`head.l.*`, `head_dist.l.*`) on a class-count
change and then `load_state_dict(strict=False)` — and keep everything else. This
is the entry for the 384² finetune recipe (the reference's best ablations live at
384, /root/reference/README.md:459-479) and the transfer datasets
(CIFAR/FLOWERS/iNat, /root/reference/data/datasets.py:29-99).

Accepted checkpoint formats:
* orbax directory — raw `{params, batch_stats[, ...]}` variables (what
  `--export-teacher` writes), or a full TrainState tree (EMA weights preferred
  when present, matching the reference's publish-the-EMA convention).
* `.msgpack` — flax serialization of the same.
* torch `.pth/.pt` — a raw reference training checkpoint (`{'model': sd}` or the
  bare state dict) via convert.torch_to_flax, or a published deployment artifact
  `*_fused.pt` (no BN running stats) via torch_fused_to_flax + fusion.defuse_params
  (identity-BN inverse embedding: the unfused model computes the identical
  function at step 0).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, List, Tuple

import numpy as np


def _flatten(tree: Any, path: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    if hasattr(tree, "items"):
        out: Dict[Tuple[str, ...], Any] = {}
        for k, v in tree.items():
            out.update(_flatten(v, path + (str(k),)))
        return out
    return {path: tree}


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    out: Dict = {}
    for path, leaf in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return out


def warm_start(template_variables: Dict, loaded_variables: Dict,
               log: Callable[[str], None] = print) -> Dict:
    """Merge `loaded_variables` into the structure/shapes of
    `template_variables`: matching-shape leaves are taken from the checkpoint,
    shape-mismatched leaves are DROPPED (template init kept — the reference's
    head-drop, main.py:286-291), missing leaves keep the template init and
    unexpected checkpoint leaves are ignored (strict=False, main.py:293-294).
    Returns a tree with exactly the template's treedef."""
    tmpl = _flatten(template_variables)
    src = _flatten(loaded_variables)
    merged: Dict[Tuple[str, ...], Any] = {}
    dropped: List[str] = []
    missing: List[str] = []
    for path, leaf in tmpl.items():
        if path in src:
            s = np.asarray(src[path])
            if tuple(s.shape) == tuple(np.shape(leaf)):
                merged[path] = s.astype(np.asarray(leaf).dtype)
            else:
                dropped.append(".".join(path))
                merged[path] = leaf
        else:
            missing.append(".".join(path))
            merged[path] = leaf
    unexpected = [".".join(p) for p in src.keys() - tmpl.keys()]
    for k in dropped:
        log(f"Removing key {k} from pretrained checkpoint (shape mismatch)")
    if missing:
        log(f"missing keys (kept at init): {missing[:8]}"
            + (f" ... +{len(missing) - 8} more" if len(missing) > 8 else ""))
    if unexpected:
        log(f"unexpected checkpoint keys (ignored): {unexpected[:8]}"
            + (f" ... +{len(unexpected) - 8} more" if len(unexpected) > 8 else ""))
    if not (len(tmpl) - len(dropped) - len(missing)):
        raise SystemExit("--finetune checkpoint shares NO leaf with the model — "
                         "wrong model family or corrupted checkpoint")
    out = _unflatten(merged)
    for k in template_variables:  # keep empty collections (e.g. a BN-free model)
        out.setdefault(k, {})
    return out


def _is_raw_state_dict(sd: Dict[str, Any]) -> bool:
    """True for an UNFUSED reference checkpoint: at least one BatchNorm named
    `norm` still lives next to its `conv`/`linear` sibling (an intact
    ConvNorm/NormLinear). Fused artifacts fold those away and keep only
    standalone BNs (which have no such sibling)."""
    keys = set(sd)
    for k in keys:
        if k.endswith(".norm.running_mean"):
            parent = k[: -len(".norm.running_mean")]
            if f"{parent}.conv.weight" in keys or f"{parent}.linear.weight" in keys:
                return True
    return False


def _load_torch(path: str, template_variables: Dict, family: str) -> Dict:
    import torch

    from recnext_tpu.convert import torch_fused_to_flax, torch_to_flax
    from recnext_tpu.fusion import defuse_params

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    if _is_raw_state_dict(sd):
        return torch_to_flax(sd)
    # published fused artifact: ConvNorm/NormLinear folded away -> inverse-embed
    fused = torch_fused_to_flax(sd, family=family)
    return defuse_params(fused["params"], template_variables)


def load_pretrained(path: str, template_variables: Dict, *, family: str = "m",
                    log: Callable[[str], None] = print) -> Dict:
    """Load a weights-only checkpoint (see module docstring for formats) and
    warm-start `template_variables` from it."""
    p = Path(path)
    if p.suffix in (".pth", ".pt", ".bin"):
        loaded = _load_torch(str(p), template_variables, family)
    elif p.suffix == ".msgpack":
        from flax import serialization

        loaded = serialization.msgpack_restore(p.read_bytes())
    else:
        import orbax.checkpoint as ocp

        loaded = ocp.StandardCheckpointer().restore(p.resolve())
    if isinstance(loaded, dict) and "params" not in loaded and "model" in loaded:
        loaded = loaded["model"]
    if isinstance(loaded, dict) and "ema_params" in loaded \
            and loaded.get("ema_params") is not None:
        # a full TrainState tree: prefer the EMA weights (the reference
        # publishes/evaluates the EMA model, main.py:449-456)
        log("finetune checkpoint is a full TrainState: using EMA weights")
        loaded = {"params": loaded["ema_params"],
                  "batch_stats": loaded.get("ema_batch_stats") or {}}
    elif isinstance(loaded, dict) and "params" in loaded:
        loaded = {"params": loaded["params"],
                  "batch_stats": loaded.get("batch_stats") or {}}
    else:
        raise SystemExit(f"--finetune: unrecognized checkpoint layout at {path}")
    if _flatten(template_variables.get("batch_stats", {})) \
            and not _flatten(loaded.get("batch_stats") or {}):
        # a BN-less tree for a BN-bearing model is a FUSED artifact (e.g. the
        # publish_fused msgpack): inverse-embed it, never merge raw — fused
        # conv kernels at matching paths would silently load without their
        # identity BNs and change the function
        from recnext_tpu.fusion import defuse_params

        log("finetune checkpoint is BN-fused: inverse-embedding (defuse_params)")
        loaded = defuse_params(loaded["params"], template_variables)
    return warm_start(template_variables, loaded, log=log)
