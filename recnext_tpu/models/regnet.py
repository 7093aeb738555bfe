"""RegNetY — the hard-distillation teacher behind every headline RecNeXt accuracy.

The reference trains with `--teacher-model regnety_160` created through timm and a
downloaded checkpoint (/root/reference/main.py:336-352; recipe README.md "RegNetY-160
teacher"). This is an eval-only Flax port of the RegNetY architecture ("Designing
Network Design Spaces", Radosavovic et al. 2020) sufficient to run that teacher on
TPU: quantized-linear width generation, Y-bottleneck blocks (1x1 -> grouped 3x3 ->
SE -> 1x1, SE ratio on block input), stride-2 stem, avg-pool + FC head.

Param naming mirrors the timm state_dict structure (stem/s1..s4/b*/conv1..3/se/
downsample/head) so `convert.regnety_torch_to_flax` is a direct name map for the
published DeiT teacher checkpoint (regnety_160 distilled teacher, 83.6M params).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import Conv2d, ConvNorm


def generate_regnet_widths(w0: float, wa: float, wm: float, depth: int,
                           q: int = 8) -> Tuple[List[int], List[int]]:
    """pycls quantized-linear rule: per-stage (widths, depths)."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = np.round(w0 * np.power(wm, ks) / q) * q
    widths = widths.astype(int).tolist()
    stage_widths = sorted(set(widths))
    stage_depths = [widths.count(w) for w in stage_widths]
    return stage_widths, stage_depths


def adjust_widths_groups(widths: Sequence[int], group_w: int,
                         bottle_ratio: float = 1.0) -> Tuple[List[int], List[int]]:
    """Make bottleneck widths divisible by their group width (pycls)."""
    ws_bot = [int(round(w * bottle_ratio)) for w in widths]
    gs = [min(group_w, wb) for wb in ws_bot]
    ws_bot = [int(round(wb / g) * g) for wb, g in zip(ws_bot, gs)]
    ws = [int(wb / bottle_ratio) for wb in ws_bot]
    return ws, gs


@dataclass(frozen=True)
class RegNetConfig:
    name: str
    w0: float
    wa: float
    wm: float
    depth: int
    group_width: int
    stem_width: int = 32
    bottle_ratio: float = 1.0
    se_ratio: float = 0.25
    num_classes: int = 1000

    def stages(self) -> Tuple[List[int], List[int], List[int]]:
        """(stage_widths, stage_depths, stage_group_widths)."""
        ws, ds = generate_regnet_widths(self.w0, self.wa, self.wm, self.depth)
        ws, gs = adjust_widths_groups(ws, self.group_width, self.bottle_ratio)
        return ws, ds, gs


REGNET_CONFIGS = {
    # regnety_160 = RegNetY-16GF: stages (224,448,1232,3024) x (2,4,11,1), g=112
    "regnety_160": RegNetConfig("regnety_160", w0=200, wa=106.23, wm=2.48,
                                depth=18, group_width=112),
    # smaller variants, handy for tests / cheaper teachers
    "regnety_040": RegNetConfig("regnety_040", w0=96, wa=31.41, wm=2.24,
                                depth=22, group_width=64),
    "regnety_016": RegNetConfig("regnety_016", w0=48, wa=20.71, wm=2.65,
                                depth=27, group_width=24),
}


class SEModule(nn.Module):
    """Squeeze-excite: avgpool -> 1x1 fc1 -> relu -> 1x1 fc2 -> sigmoid gate."""

    rd_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = s.astype(x.dtype)
        s = Conv2d(self.rd_channels, 1, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = Conv2d(x.shape[-1], 1, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class YBottleneck(nn.Module):
    """RegNetY bottleneck: 1x1 -> grouped 3x3 (stride) -> SE -> 1x1, residual.
    SE reduction channels come from the BLOCK INPUT width (pycls w_se = w_in * se_r)."""

    in_channels: int
    out_channels: int
    stride: int
    group_width: int
    bottle_ratio: float = 1.0
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        w_b = int(round(self.out_channels * self.bottle_ratio))
        groups = max(1, w_b // self.group_width)
        y = nn.relu(ConvNorm(w_b, 1, dtype=self.dtype, name="conv1")(x, training))
        y = nn.relu(ConvNorm(w_b, 3, stride=self.stride, padding=1, groups=groups,
                             dtype=self.dtype, name="conv2")(y, training))
        y = SEModule(rd_channels=max(1, int(round(self.in_channels * self.se_ratio))),
                     dtype=self.dtype, name="se")(y)
        y = ConvNorm(self.out_channels, 1, dtype=self.dtype, name="conv3")(y, training)
        if self.stride != 1 or self.in_channels != self.out_channels:
            x = ConvNorm(self.out_channels, 1, stride=self.stride, dtype=self.dtype,
                         name="downsample")(x, training)
        return nn.relu(y + x)


class RegNetY(nn.Module):
    cfg: RegNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = nn.relu(ConvNorm(c.stem_width, 3, stride=2, padding=1,
                             dtype=self.dtype, name="stem")(x, training))
        ws, ds, gs = c.stages()
        cin = c.stem_width
        for si, (w, d, g) in enumerate(zip(ws, ds, gs)):
            for bi in range(d):
                x = YBottleneck(
                    in_channels=cin, out_channels=w,
                    stride=2 if bi == 0 else 1, group_width=g,
                    bottle_ratio=c.bottle_ratio, se_ratio=c.se_ratio,
                    dtype=self.dtype, name=f"s{si + 1}_b{bi + 1}")(x, training)
                cin = w
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(c.num_classes, dtype=jnp.float32, name="head_fc")(x)


def create_regnet(name: str, *, num_classes: int = 1000,
                  dtype: Any = jnp.float32) -> RegNetY:
    import dataclasses

    if name not in REGNET_CONFIGS:
        raise KeyError(f"unknown regnet {name!r}; known: {sorted(REGNET_CONFIGS)}")
    cfg = dataclasses.replace(REGNET_CONFIGS[name], num_classes=num_classes)
    return RegNetY(cfg=cfg, dtype=dtype)
