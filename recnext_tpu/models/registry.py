"""Model registry: named variants -> RecNextConfig, and create_model().

Config table consolidated from /root/reference/model/recnext.py:365-407 (M),
/root/reference/model/recattn.py:378-420 (A), /root/reference/lsnet/model/recattn.py:441-465 (L)
and /root/reference/upload.py:10-35. Drop-path defaults apply only without
distillation, matching the reference's per-variant logic.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from recnext_tpu.models.recnext import RecNext, RecNextConfig


def _m(name, embed_dim, depth, drop_path=0.0):
    return RecNextConfig(name=name, family="m", embed_dim=embed_dim, depth=depth,
                         mlp_ratio=(2, 2, 2, 2), drop_path=drop_path)


def _a(name, embed_dim, depth, mlp_ratio=2.0, drop_path=0.0):
    return RecNextConfig(name=name, family="a", embed_dim=embed_dim, depth=depth,
                         mlp_ratio=(mlp_ratio,) * 4, drop_path=drop_path)


def _l(name, embed_dim, depth, drop_path=0.0, share_channel=False):
    return RecNextConfig(name=name, family="l", embed_dim=embed_dim, depth=depth,
                         mlp_ratio=(2, 2, 2, 1.5), num_heads=(1, 1, 1, 2),
                         split_rates=(4, 4, 4, 4), drop_path=drop_path,
                         share_channel=share_channel)


# drop_path values are the *without-distillation* defaults; create_model zeroes them
# when distillation=True (reference recnext.py:397,405 etc.).
MODEL_CONFIGS = {
    "recnext_m0": _m("recnext_m0", (40, 80, 160, 320), (2, 2, 9, 1)),
    "recnext_m1": _m("recnext_m1", (48, 96, 192, 384), (3, 3, 15, 2)),
    "recnext_m2": _m("recnext_m2", (56, 112, 224, 448), (3, 3, 15, 2)),
    "recnext_m3": _m("recnext_m3", (64, 128, 256, 512), (3, 3, 13, 2)),
    "recnext_m4": _m("recnext_m4", (64, 128, 256, 512), (5, 5, 25, 4), drop_path=0.2),
    "recnext_m5": _m("recnext_m5", (80, 160, 320, 640), (7, 7, 35, 2), drop_path=0.3),
    "recnext_a0": _a("recnext_a0", (40, 80, 160, 320), (2, 2, 9, 1)),
    "recnext_a1": _a("recnext_a1", (48, 96, 192, 384), (3, 3, 15, 2)),
    "recnext_a2": _a("recnext_a2", (56, 112, 224, 448), (3, 3, 15, 2)),
    "recnext_a3": _a("recnext_a3", (64, 128, 256, 512), (3, 3, 13, 2), mlp_ratio=1.875),
    "recnext_a4": _a("recnext_a4", (64, 128, 256, 512), (5, 5, 25, 4), mlp_ratio=1.875, drop_path=0.2),
    "recnext_a5": _a("recnext_a5", (80, 160, 320, 640), (7, 7, 35, 2), mlp_ratio=1.875, drop_path=0.3),
    "recnext_t": _l("recnext_t", (64, 128, 256, 512), (0, 2, 8, 10)),
    "recnext_s": _l("recnext_s", (128, 256, 384, 512), (0, 2, 8, 10), drop_path=0.1),
    "recnext_b": _l("recnext_b", (128, 256, 384, 512), (2, 8, 8, 12), drop_path=0.2),
    "recnext_t_share_channel": _l("recnext_t_share_channel", (64, 128, 256, 512),
                                  (0, 2, 8, 10), share_channel=True),
    "recnext_s_share_channel": _l("recnext_s_share_channel", (128, 256, 384, 512),
                                  (0, 2, 8, 10), drop_path=0.1, share_channel=True),
    "recnext_b_share_channel": _l("recnext_b_share_channel", (128, 256, 384, 512),
                                  (2, 8, 8, 12), drop_path=0.2, share_channel=True),
}


def get_config(name: str, **overrides: Any) -> RecNextConfig:
    if name not in MODEL_CONFIGS:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_CONFIGS)}")
    cfg = MODEL_CONFIGS[name]
    if overrides.get("distillation") and "drop_path" not in overrides:
        overrides["drop_path"] = 0.0
    return dataclasses.replace(cfg, **overrides)


def create_model(
    name: str,
    *,
    fused: bool = False,
    frozen_stats: bool = False,
    dtype: Any = jnp.float32,
    **overrides: Any,
) -> RecNext:
    """timm-create_model counterpart: create_model('recnext_m1', distillation=True)."""
    cfg = get_config(name, **overrides)
    return RecNext(cfg=cfg, fused=fused, frozen_stats=frozen_stats, dtype=dtype)


def list_models():
    return sorted(MODEL_CONFIGS)


def parse_kv_overrides(spec: str) -> dict:
    """Parse CLI 'k=v,k2=v2' RecNextConfig overrides (ablation knobs: e.g.
    'recconv_kernel_size=3,recconv_mode=nearest,attn_kernel=relu'). Values are
    coerced int -> float -> bool -> str; unknown keys fail loudly inside
    dataclasses.replace."""
    out: dict = {}
    for pair in filter(None, (p.strip() for p in spec.split(","))):
        if "=" not in pair:
            raise ValueError(f"--model-kwargs entry {pair!r} is not key=value")
        k, v = pair.split("=", 1)
        for cast in (int, float):
            try:
                out[k] = cast(v)
                break
            except ValueError:
                continue
        else:
            out[k] = {"true": True, "false": False}.get(v.lower(), v)
    return out
