"""Utilities for loading the *reference* PyTorch model code as a test oracle.

The reference imports timm, which is not installed; we stub the handful of timm
symbols it uses (trunc_normal_, DropPath, registry plumbing) and import the reference
modules directly from /root/reference so golden-parity tests compare against the real
thing rather than a re-implementation. Nothing from the reference is copied into the
repo — it is only imported read-only at test time.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules and getattr(sys.modules["timm"], "_recnext_stub", False):
        return
    timm = types.ModuleType("timm")
    timm._recnext_stub = True
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0], 1, 1, 1), keep, device=x.device))
            return x * mask / keep

    def register_model(fn):
        return fn

    def create_model(name, **kwargs):
        raise NotImplementedError("use the registered fns directly in tests")

    def build_model_with_cfg(cls, variant, pretrained, feature_cfg=None, **kwargs):
        kwargs.pop("pretrained_cfg", None)
        return cls(**kwargs)

    def generate_default_cfgs(cfgs):
        return cfgs

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    models.register_model = register_model
    models.create_model = create_model
    models.build_model_with_cfg = build_model_with_cfg
    models.generate_default_cfgs = generate_default_cfgs
    # timm.models.layers (old-style path used by the mlla files)
    models_layers = types.ModuleType("timm.models.layers")
    models_layers.DropPath = DropPath
    models_layers.to_2tuple = to_2tuple
    models_layers.trunc_normal_ = trunc_normal_
    models.layers = models_layers
    models.__path__ = []  # mark as package so 'timm.models.layers' imports resolve
    timm.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = models_layers


def load_ref_module(rel_path: str, name: str):
    """Import a reference file (e.g. 'model/recnext.py') with the timm stub active."""
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel_path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def to_nhwc(x: torch.Tensor):
    return x.detach().permute(0, 2, 3, 1).contiguous().numpy()


def to_nchw_tensor(x_nhwc) -> torch.Tensor:
    import numpy as np

    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()
