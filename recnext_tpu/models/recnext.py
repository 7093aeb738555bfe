"""RecNext backbone — ONE definition covering the M (RecConv), A (RecAttn) and
L (LSNet-style) families, replacing the reference's four copy-pasted backbones
(classification model/, lsnet/model/, detection/, segmentation/ — SURVEY.md §1).

Reference model assembly: /root/reference/model/recnext.py:134-287 (M),
/root/reference/model/recattn.py:148-300 (A), /root/reference/lsnet/model/recattn.py:205-387 (L).

TPU-first design:
* NHWC everywhere; channels ride the 128-wide lane dimension.
* `features()` returns the 4-stage pyramid {C2..C5} as the stable feature-extractor
  API used by detection/segmentation heads (replacing the reference's re-registered
  backbone copies, detection/recnext.py:213-219).
* `frozen_stats=True` gives the detection "frozen-BN" mode
  (detection/recnext.py:266-272) — BN always uses running stats, even in training.
* The whole model is jit-able with static shapes; the fused (inference) structure is
  selected by `fused=True` and its parameters are produced by the pure transform in
  recnext_tpu/fusion.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recnext_tpu.models.layers import (
    BatchNorm,
    Conv2d,
    ConvNorm,
    DropPath,
    FusedAffine,
    Mlp,
    NormLinear,
    RepVGGDW,
    frozen_bn_scope,
    gelu,
)
from recnext_tpu.models.mixers import (
    LinearAttention,
    RecAttn2d,
    RecConv2dMixer,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RecNextConfig:
    """Static architecture description for one model variant."""

    name: str
    family: str  # "m" | "a" | "l"
    embed_dim: Tuple[int, ...]
    depth: Tuple[int, ...]
    mlp_ratio: Tuple[float, ...]
    num_heads: Tuple[int, ...] = (2, 2, 2, 2)  # L only
    split_rates: Tuple[int, ...] = (4, 4, 4, 4)  # L only
    drop_path: float = 0.0
    num_classes: int = 1000
    distillation: bool = False
    drop_rate: float = 0.0
    in_chans: int = 3
    share_channel: bool = False  # L share-channel variant
    # RecConv bilinear upsample implementation: "matmul" rides the (otherwise idle)
    # MXU via two small einsums and is ~23% faster end-to-end on v5e than the
    # VPU-gather form (PERF.md); both compute the identical PyTorch-exact function.
    recconv_upsample: str = "matmul"
    # RecConv ablation knobs (the reference's logs/ablation/* rec_{3x3,5x5,7x7}
    # and *_nearest runs were built by passing kernel_size/mode into RecConv2d,
    # model/recnext.py:9,426 — here they are first-class config)
    recconv_kernel_size: int = 5
    recconv_mode: str = "bilinear"  # "bilinear" | "nearest"
    # linear-attention feature map: elu | softplus | relu (the lsnet "Promising
    # refinement" kernel ablation, /root/reference/lsnet/README.md)
    attn_kernel: str = "elu"
    # variant-1 linear-attention formulation: "blockdiag" (NHWC masked-dense,
    # no head split/merge transposes; +7-18% on a0-a2, PERF.md round 5) or
    # "headbatch" (per-head einsums, the pre-round-5 form). Equal to fp32
    # reduction order; variant-2/3 stages always run head-batched.
    attn_impl: str = "blockdiag"

    @property
    def num_features(self) -> int:
        return self.embed_dim[-1]

    def feature_info(self):
        stride = 4 if self.family != "l" else 8
        info = []
        for i, dim in enumerate(self.embed_dim):
            if i != 0:
                stride *= 2
            info.append(dict(num_chs=dim, reduction=stride, module=f"stages_{i}"))
        return info


class RecNextStem(nn.Module):
    """M/A: two stride-2 3x3 ConvNorm + GELU (total stride 4),
    reference /root/reference/model/recnext.py:134-146.
    L: three stride-2 3x3 ConvNorm (out/4 -> out/2 -> out, stride 8) with an optional
    trailing activation when depth[0]==0, /root/reference/lsnet/model/recattn.py:208-223."""

    out_channels: int
    family: str = "m"
    additional_activation: bool = False
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        kw = dict(
            kernel_size=3,
            stride=2,
            padding=1,
            use_bias=(self.family == "l"),
            fused=self.fused,
            dtype=self.dtype,
        )
        if self.family == "l":
            x = ConvNorm(self.out_channels // 4, name="conv1", **kw)(x, training=training)
            x = gelu(x)
            x = ConvNorm(self.out_channels // 2, name="conv2", **kw)(x, training=training)
            x = gelu(x)
            x = ConvNorm(self.out_channels, name="conv3", **kw)(x, training=training)
            if self.additional_activation:
                x = gelu(x)
            return x
        x = ConvNorm(self.out_channels // 2, name="conv1", **kw)(x, training=training)
        x = gelu(x)
        return ConvNorm(self.out_channels, name="conv2", **kw)(x, training=training)


class MetaNeXtBlockM(nn.Module):
    """x + drop_path(mlp(BN(RecConv2d(x)))), RecConv level=4-stage, k=5.
    Reference: /root/reference/model/recnext.py:149-158."""

    mlp_ratio: float
    stage: int
    drop_path: float = 0.0
    upsample: str = "gather"
    kernel_size: int = 5
    mode: str = "bilinear"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        y = RecConv2dMixer(level=4 - self.stage, kernel_size=self.kernel_size,
                           mode=self.mode, dtype=self.dtype,
                           upsample=self.upsample, name="token_mixer")(x)
        if self.fused:
            y = FusedAffine(name="norm")(y)
        else:
            y = BatchNorm(name="norm")(y, training=training)
        y = Mlp(int(c * self.mlp_ratio), c, fused=self.fused, dtype=self.dtype,
                name="channel_mixer")(y, training=training)
        y = DropPath(self.drop_path, name="drop_path")(y, training=training)
        return x + y


class MetaNeXtBlockA(nn.Module):
    """x + drop_path(mlp(RecAttn2d(x))); heads=2^(stage+1), LA2 at stage 3.
    Reference: /root/reference/model/recattn.py:163-171."""

    mlp_ratio: float
    stage: int
    drop_path: float = 0.0
    attn_kernel: str = "elu"
    attn_impl: str = "blockdiag"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        y = RecAttn2d(
            num_heads=2 ** (self.stage + 1),
            la_variant=2 if self.stage >= 3 else 1,
            kernel=self.attn_kernel,
            attn_impl=self.attn_impl,
            fused=self.fused,
            dtype=self.dtype,
            name="token_mixer",
        )(x, training=training)
        y = Mlp(int(c * self.mlp_ratio), c, fused=self.fused, dtype=self.dtype,
                name="channel_mixer")(y, training=training)
        y = DropPath(self.drop_path, name="drop_path")(y, training=training)
        return x + y


class MetaNeXtBlockL(nn.Module):
    """RepVGGDW, then x + drop_path(mlp(PartialChannel(mixer)(x))); mixer is RecAttn2d
    (LA1 stage 0, LA2 stages 1-2) or plain LinearAttention3 at stage >= la3_from_stage.
    Reference: /root/reference/lsnet/model/recattn.py:240-251.

    Share-channel mode (/root/reference/lsnet/model/recattn_share_channel.py:265-325):
    `share="collect"` appends the partial-channel output to `x1s`; `share="share"`
    replaces the token mixer with x + concat(x1s) (the previous split_rate partial
    outputs). The share-channel variant also moves the LA3 cutoff to stage >= 2 and
    uses single-head attention throughout."""

    mlp_ratio: float
    stage: int
    num_heads: int = 2
    split_rate: int = 4
    drop_path: float = 0.0
    la3_from_stage: int = 3
    share: str = "off"  # off | collect | share
    attn_kernel: str = "elu"
    attn_impl: str = "blockdiag"
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 x1s: Optional[list] = None) -> jnp.ndarray:
        c = x.shape[-1]
        kw = dict(use_bias=True, kernel=self.attn_kernel,
                  attn_impl=self.attn_impl, fused=self.fused, dtype=self.dtype)
        x = RepVGGDW(fused=self.fused, dtype=self.dtype, name="rep_mixer")(
            x, training=training
        )
        if self.share == "share":
            # ShareChannelOperation: x + concat of the collected partial outputs
            y = x + jnp.concatenate(x1s, axis=-1)
        else:
            if self.stage >= self.la3_from_stage:
                inner = LinearAttention(self.num_heads, variant=3, name="attn", **kw)
            else:
                inner = RecAttn2d(
                    num_heads=self.num_heads,
                    la_variant=1 if self.stage == 0 else 2,
                    name="attn",
                    **kw,
                )
            # PartialChannelOperation (lsnet/model/recattn.py:226-237), inlined so the
            # attn params bind at block scope (torch key token_mixer.attn.* -> attn.*).
            split = c // self.split_rate
            y1 = inner(x[..., :split], training=training)
            if self.share == "collect" and x1s is not None:
                x1s.append(y1)
            y = jnp.concatenate([y1, x[..., split:]], axis=-1)
        y = Mlp(int(c * self.mlp_ratio), c, use_bias=True, fused=self.fused,
                dtype=self.dtype, name="channel_mixer")(y, training=training)
        y = DropPath(self.drop_path, name="drop_path")(y, training=training)
        return x + y


class Downsample(nn.Module):
    """M/A: DW 7x7 stride-2 conv (channels double) + BN, then x + mlp(x).
    Reference: /root/reference/model/recnext.py:161-171."""

    mlp_ratio: float
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        cout = cin * 2
        x = Conv2d(cout, 7, stride=2, padding=3, groups=cin, use_bias=True,
                   dtype=self.dtype, name="token_mixer")(x)
        if self.fused:
            x = FusedAffine(name="norm")(x)
        else:
            x = BatchNorm(name="norm")(x, training=training)
        y = Mlp(int(cout * self.mlp_ratio), cout, fused=self.fused, dtype=self.dtype,
                name="channel_mixer")(x, training=training)
        return x + y


class DownsampleL(nn.Module):
    """L: k=5 stride-2 grouped ConvNorm (groups=gcd), then x + drop_path(mlp(x)).
    Reference: /root/reference/lsnet/model/recattn.py:254-263."""

    out_channels: int
    mlp_ratio: float
    drop_path: float = 0.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        g = int(np.gcd(cin, self.out_channels))
        x = ConvNorm(self.out_channels, 5, stride=2, padding=2, groups=g,
                     use_bias=True, fused=self.fused, dtype=self.dtype,
                     name="token_mixer")(x, training=training)
        y = Mlp(int(self.out_channels * self.mlp_ratio), self.out_channels,
                use_bias=True, fused=self.fused, dtype=self.dtype,
                name="channel_mixer")(x, training=training)
        y = DropPath(self.drop_path, name="drop_path")(y, training=training)
        return x + y


class RecNextClassifier(nn.Module):
    """Dual NormLinear heads; training+distillation returns a tuple, otherwise the
    average. Fused form is a single Dense (the two fused heads averaged).
    Reference: /root/reference/model/recnext.py:174-201."""

    num_classes: int
    distillation: bool = False
    drop: float = 0.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        if self.num_classes <= 0:
            return x
        if self.drop > 0.0 and training:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.drop
            mask = jax.random.bernoulli(rng, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        if self.fused:
            return NormLinear(self.num_classes, fused=True, dtype=self.dtype,
                              name="head")(x, training=training)
        x1 = NormLinear(self.num_classes, dtype=self.dtype, name="head")(
            x, training=training
        )
        x2 = NormLinear(self.num_classes, dtype=self.dtype, name="head_dist")(
            x, training=training
        )
        if training and self.distillation:
            return x1, x2
        return (x1 + x2) / 2


def _drop_path_rates(cfg: RecNextConfig):
    """Per-block drop-path rates. M/A use a constant; L uses a linspace over total
    depth split per stage (/root/reference/lsnet/model/recattn.py:335)."""
    if cfg.family != "l":
        return [[cfg.drop_path] * d for d in cfg.depth]
    total = sum(cfg.depth)
    ramp = np.linspace(0.0, cfg.drop_path, total) if total > 1 else np.zeros(total)
    out, i = [], 0
    for d in cfg.depth:
        out.append([float(r) for r in ramp[i : i + d]])
        i += d
    return out


class RecNext(nn.Module):
    """Top-level backbone: stem -> 4 stages -> global avg-pool -> classifier.

    Methods: `__call__` (logits), `forward_features` (final C5 map),
    `features` (list of 4 pyramid maps — the downstream-task API)."""

    cfg: RecNextConfig
    fused: bool = False
    frozen_stats: bool = False  # detection frozen-BN mode
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.stem = RecNextStem(
            cfg.embed_dim[0],
            family=cfg.family,
            additional_activation=(cfg.family == "l" and cfg.depth[0] == 0),
            fused=self.fused,
            dtype=self.dtype,
            name="stem",
        )
        rates = _drop_path_rates(cfg)
        downsamples = []
        stage_blocks = []
        for i, (dim, depth) in enumerate(zip(cfg.embed_dim, cfg.depth)):
            ratio = cfg.mlp_ratio[i]
            if i == 0:
                downsamples.append(None)
            elif cfg.family == "l":
                downsamples.append(
                    DownsampleL(dim, ratio, drop_path=rates[i][0] if depth else 0.0,
                                fused=self.fused, dtype=self.dtype,
                                name=f"downsample_{i}")
                )
            else:
                downsamples.append(
                    Downsample(ratio, fused=self.fused, dtype=self.dtype,
                               name=f"downsample_{i}")
                )
            blocks = []
            for j in range(depth):
                name = f"stage{i}_block{j}"
                if cfg.family == "m":
                    blocks.append(MetaNeXtBlockM(ratio, stage=i, drop_path=rates[i][j],
                                                 upsample=cfg.recconv_upsample,
                                                 kernel_size=cfg.recconv_kernel_size,
                                                 mode=cfg.recconv_mode,
                                                 fused=self.fused, dtype=self.dtype,
                                                 name=name))
                elif cfg.family == "a":
                    blocks.append(MetaNeXtBlockA(ratio, stage=i, drop_path=rates[i][j],
                                                 attn_kernel=cfg.attn_kernel,
                                                 attn_impl=cfg.attn_impl,
                                                 fused=self.fused, dtype=self.dtype,
                                                 name=name))
                else:
                    share = "off"
                    la3_from = 3
                    heads = cfg.num_heads[i]
                    if cfg.share_channel:
                        # share-channel variant: LA3 from stage 2; stage 3 is the
                        # share stage with every (split_rate+1)-th block sharing;
                        # attention is single-head throughout (the share-channel file's
                        # LAs take no num_heads, recattn_share_channel.py:37-110)
                        la3_from = 2
                        heads = 2 if i >= 2 else 1  # LA3's internal heads = n//2 = 1
                        if i >= 3:
                            share = ("share" if (j + 1) % (cfg.split_rates[i] + 1) == 0
                                     else "collect")
                    blocks.append(
                        MetaNeXtBlockL(ratio, stage=i, num_heads=heads,
                                       split_rate=cfg.split_rates[i],
                                       drop_path=rates[i][j], la3_from_stage=la3_from,
                                       share=share, attn_kernel=cfg.attn_kernel,
                                       attn_impl=cfg.attn_impl, fused=self.fused,
                                       dtype=self.dtype, name=name)
                    )
            stage_blocks.append(blocks)
        self.downsamples = downsamples
        self.stage_blocks = stage_blocks
        self.classifier = RecNextClassifier(
            cfg.num_classes,
            distillation=cfg.distillation,
            drop=cfg.drop_rate,
            fused=self.fused,
            dtype=self.dtype,
            name="head",
        )

    def features(self, x: jnp.ndarray, training: bool = False):
        """Multi-scale pyramid [C2, C3, C4, C5] (detection/recnext.py:213-219).

        frozen_stats freezes ONLY BatchNorm (running stats, no updates) via
        frozen_bn_scope — DropPath/dropout stay governed by `training`, matching
        the reference's frozen-BN train() which .eval()s only BN modules
        (detection/recnext.py:266-272)."""
        with frozen_bn_scope(self.frozen_stats):
            x = self.stem(x, training=training)
            outs = []
            for ds, blocks in zip(self.downsamples, self.stage_blocks):
                if ds is not None:
                    x = ds(x, training=training)
                x1s: list = []
                for blk in blocks:
                    if getattr(blk, "share", "off") != "off":
                        x = blk(x, training=training, x1s=x1s)
                        if blk.share == "share":
                            x1s.clear()
                    else:
                        x = blk(x, training=training)
                outs.append(x)
            return outs

    def forward_features(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return self.features(x, training=training)[-1]

    def __call__(self, x: jnp.ndarray, training: bool = False):
        x = self.forward_features(x, training=training)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        with frozen_bn_scope(self.frozen_stats):
            return self.classifier(x, training=training)
