"""Lane-packed fused-inference executor for the M and A families — the
stage-0/1/2 sub-128-lane squeeze (PERF.md round-2 experiments).

Why: TPU vector registers are 8x128; NHWC puts channels on the 128-wide lane
axis. m1's stages run at C = 48/96/192 -> 37.5%/75%/75% lane utilization for
every VPU-bound depthwise conv (RecConv's 5x5s, the 7x7 downsamples). Depthwise
convs, per-channel affines and GELU are CHANNEL-INDEPENDENT, so g images can be
folded into the channel axis: (B,H,W,C) -> (B/g, H, W, g*C) with kernels tiled
g times — picking g = lcm(C,128)/C makes every tensor an exact multiple of 128
lanes. The dense 1x1 mlp convs become feature_group_count=g grouped convs (one
group per packed image), which is exact, and the stride-2 grouped downsample
convs tile the same way.

The trick needs NO repacking between stages: the downsample doubles C while g
stays fixed, so lane width is constant from stage 0 on. One pack after the stem,
one free reshape before the classifier (global pooling commutes with packing).

The A family packs too: RecAttn2d is a composition of channel-independent ops
(depthwise down/pe/out convs) and PER-HEAD linear attention. Heads are
contiguous channel blocks, so g packed images simply become g*num_heads heads —
the qk projection (a groups=2 1x1 conv) tiles to groups=2g with the same
kernel-repeat as every other per-channel parameter, and the per-head fp32
normalizer never mixes images.

Numerically EXACT vs RecNext(fused=True).apply for both families (same params,
same op order) — asserted in tests/test_packed_infer.py, including a slow sweep
over every m/a registry variant. Inference-only: BN is
already folded into affines/conv biases in the fused layout, so there are no
cross-image batch statistics to corrupt.

Reference counterpart: none (deployment-engine optimization, like the
reference's CoreML/TensorRT export paths — /root/reference/export_coreml.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from recnext_tpu.models.layers import gelu
from recnext_tpu.models.recnext import RecNextConfig
from recnext_tpu.ops.attention import (
    feature_map,
    linear_attention_kv_first,
    linear_attention_qk_first,
)
from recnext_tpu.ops.conv import conv2d
from recnext_tpu.ops.recconv import rec_conv2d
from recnext_tpu.ops.resize import resize, resize_matmul


# Per-variant measured optima (v5e, batch 256, PERF.md round-2 policy sweep).
# No closed-form rule wins everywhere: g=4 pays on m0's stage 2 and a5's stage 1
# but loses on a0's stage 2 at the same channel count — the balance between the
# depthwise-conv lane gain and the grouped-1x1 relayout tax is shape-dependent,
# so we ship what was measured and fall back to the conservative rule below.
MEASURED_GROUPS: Dict[str, Tuple[int, ...]] = {
    "recnext_m0": (1, 1, 4, 2),   # 12314 -> 13261 img/s
    "recnext_m1": (1, 1, 2, 1),   # 8086 -> 9362
    "recnext_m2": (1, 1, 1, 2),   # 6782 -> 6904
    "recnext_m4": (1, 1, 1, 1),   # round-3 sweep: every packing loses (best g: -0.4%)
    "recnext_m5": (1, 1, 2, 1),   # 1982 -> 2277
    # a-family entries re-earned under the round-5 blockdiag attention default
    # (sweep_a*_blockdiag_r5.log): a0 gained a stage-1 pack, a3 (never swept in
    # rounds 2-3) gained its first entry, a1/a2/a4/a5 round-3 winners held.
    "recnext_a0": (1, 2, 1, 2),   # 12740 -> 13086 (round-3 (1,1,1,2): 12887)
    "recnext_a1": (1, 1, 2, 1),   # 7955 -> 8499
    "recnext_a2": (1, 1, 1, 2),   # 5868 -> 6314
    "recnext_a3": (1, 1, 2, 1),   # 5586 -> 6031
    "recnext_a4": (1, 1, 2, 1),   # 3304 -> 3611
    "recnext_a5": (1, 4, 2, 1),   # 1097 -> 1824
}


def default_groups(cfg: RecNextConfig, batch: int) -> Tuple[int, ...]:
    """Measured per-variant policy (PERF.md round-2 sweep) with a conservative
    fallback: pack g=2 only where it lands on EXACT 128-lane alignment
    (C % 128 == 64) — that move never lost on any measured variant, while
    wider groups or partial alignment are shape-dependent gambles."""
    groups = MEASURED_GROUPS.get(cfg.name)
    if groups is None:
        groups = tuple(2 if c >= 128 and c % 128 == 64 else 1
                       for c in cfg.embed_dim)
    out = []
    for g in groups:
        while g > 1 and batch % g != 0:
            g //= 2
        out.append(g)
    return tuple(out)


def pack(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B/g,H,W,g*C); image i of a group occupies channel block i."""
    if g == 1:
        return x
    return jnp.concatenate([x[i::g] for i in range(g)], axis=-1)


def unpack(z: jnp.ndarray, g: int, orig_batch: int) -> jnp.ndarray:
    if g == 1:
        return z
    parts = jnp.split(z, g, axis=-1)
    out = jnp.stack(parts, axis=1)
    return out.reshape((orig_batch,) + z.shape[1:-1] + (z.shape[-1] // g,))


def _tile(w: jnp.ndarray, g: int) -> jnp.ndarray:
    """Tile per-channel params (last axis) g times for the packed layout."""
    if g == 1:
        return w
    reps = (1,) * (w.ndim - 1) + (g,)
    return jnp.tile(w, reps)


def _blockdiag(kernel: jnp.ndarray, g: int) -> jnp.ndarray:
    """(1,1,Cin,Cout) 1x1 kernel -> (1,1,g*Cin,g*Cout) block-diagonal: the
    grouped per-packed-image conv re-expressed as ONE dense MXU contraction.
    The g-1 off-diagonal blocks are exact zeros, so each output still sums
    exactly the same products; this trades g x the FLOPs (on the otherwise
    idle MXU — the m family is VPU-bound, PERF.md) for removing the grouped
    conv's lane-split relayout, which is what made stage-0/1 packing lose in
    the round-2 sweep."""
    if g == 1:
        return kernel
    w = kernel[0, 0]
    return jnp.kron(jnp.eye(g, dtype=w.dtype), w)[None, None]


def _packed_linear_attention(qk: jnp.ndarray, v: jnp.ndarray, g: int,
                             num_heads: int, head_dim: int,
                             variant: int) -> jnp.ndarray:
    """qk (B,H,W,g*2c) [feature-mapped], v (B,H,W,g*c) -> (B,H,W,g*c).
    Packed images contribute disjoint head blocks: (g, 2, nh, hd) channel-major
    per image block, exactly the torch view(b,2,nh,hd,n) decomposition applied
    per packed image (models/mixers.py:_split_qk_nhwc)."""
    b, h, w, _ = qk.shape
    n = h * w
    c = v.shape[-1] // g
    dv = c // num_heads
    qk = qk.reshape(b, n, g, 2, num_heads, head_dim)
    qk = jnp.transpose(qk, (3, 0, 2, 4, 1, 5))  # (2, b, g, nh, n, hd)
    q = qk[0].reshape(b * g * num_heads, n, head_dim)
    k = qk[1].reshape(b * g * num_heads, n, head_dim)
    vh = v.reshape(b, n, g, num_heads, dv)
    vh = jnp.transpose(vh, (0, 2, 3, 1, 4)).reshape(b * g * num_heads, n, dv)
    la = linear_attention_kv_first if variant == 1 else linear_attention_qk_first
    o = la(q, k, vh)
    o = o.reshape(b, g, num_heads, n, dv)
    o = jnp.transpose(o, (0, 3, 1, 2, 4)).reshape(b, h, w, g * c)
    return o


def packed_apply(variables: Dict, cfg: RecNextConfig, x: jnp.ndarray,
                 *, group: Optional[int] = None,
                 groups: Optional[Tuple[int, ...]] = None,
                 nearest_upsample: str = "gather",
                 mlp_mode: str = "grouped",
                 attn_impl: str = "blockdiag") -> jnp.ndarray:
    """Fused-inference forward for the m and a families, numerically identical
    to RecNext(cfg, fused=True).apply(variables, x, training=False).

    `groups` gives the per-stage packing factor (1 = plain layout). Defaults to
    the measured `default_groups` policy; `group` forces one factor everywhere.

    `mlp_mode` selects the packed 1x1 mlp formulation: 'grouped' (the shipping
    feature_group_count=g conv, bit-exact) or 'blockdiag' (one dense MXU
    contraction with exact-zero off-diagonal blocks — same products summed, but
    a different reduction-tree shape, so exact only to fp32-reassociation).

    `attn_impl` selects the A-family linear-attention formulation:
    'blockdiag' (the shipping default since round 5: one dense masked
    contraction computed IN the NHWC layout,
    ops/attention.py:linear_attention_blockdiag — measured +7-18% on a0-a2,
    exact to fp32-reassociation; also the model's variant-1 default, so g=1
    stages stay bit-identical to the fused model forward) or 'headbatch'
    (per-head einsums via 6-D split/merge transposes, the pre-round-5 A/B
    form) or 'blockdiag_fused' (normalizer column riding the kv matmul —
    measured NEGATIVE, kept for A/B)."""
    assert cfg.family in ("m", "a"), \
        "packed inference implemented for the m and a families"
    assert mlp_mode in ("grouped", "blockdiag"), mlp_mode
    p = variables["params"]
    B = x.shape[0]
    if group is not None:
        stage_groups = (group,) * 4
    elif groups is not None:
        stage_groups = groups
    else:
        stage_groups = default_groups(cfg, B)
    dt = x.dtype

    def cv(params, x, **kw):
        return conv2d(x, jnp.asarray(params["kernel"], dt),
                      params.get("bias"), **kw)

    # stem: dense convs at full resolution, unpacked
    s = p["stem"]
    x = gelu(cv(s["conv1"]["conv"], x, stride=2, padding=1))
    x = cv(s["conv2"]["conv"], x, stride=2, padding=1)

    def affine(params, x, g):
        scale = _tile(jnp.asarray(params["scale"], dt), g)
        shift = _tile(jnp.asarray(params["shift"], dt), g)
        return x * scale + shift

    def mlp(params, x, g):
        if mlp_mode == "blockdiag":
            h = cv({"kernel": _blockdiag(jnp.asarray(params["fc1"]["conv"]["kernel"], dt), g),
                    "bias": _tile(jnp.asarray(params["fc1"]["conv"]["bias"], dt), g)}, x)
            h = gelu(h)
            return cv({"kernel": _blockdiag(jnp.asarray(params["fc2"]["conv"]["kernel"], dt), g),
                       "bias": _tile(jnp.asarray(params["fc2"]["conv"]["bias"], dt), g)}, h)
        h = cv({"kernel": _tile(jnp.asarray(params["fc1"]["conv"]["kernel"], dt), g),
                "bias": _tile(jnp.asarray(params["fc1"]["conv"]["bias"], dt), g)},
               x, groups=g)
        h = gelu(h)
        return cv({"kernel": _tile(jnp.asarray(params["fc2"]["conv"]["kernel"], dt), g),
                   "bias": _tile(jnp.asarray(params["fc2"]["conv"]["bias"], dt), g)},
                  h, groups=g)

    def re_group(x, g, target):
        if target == g:
            return x, g
        if g != 1:
            x = unpack(x, g, B)
        return (pack(x, target) if target != 1 else x), target

    g = 1
    for i, (dim, depth) in enumerate(zip(cfg.embed_dim, cfg.depth)):
        if i > 0:
            # downsamples run UNPACKED: measured on v5e, packing them loses
            # (m1 8801 img/s vs 9390 with stage-blocks-only packing) — the 28²
            # pack transition costs more than the packed 7x7 dw conv saves.
            ds_g = 1
            x, g = re_group(x, g, ds_g)
            d = p[f"downsample_{i}"]
            cin = d["token_mixer"]["kernel"].shape[-1] // 2  # (7,7,1,2*cin)
            y = conv2d(x, _tile(jnp.asarray(d["token_mixer"]["kernel"], dt), g),
                       _tile(jnp.asarray(d["token_mixer"]["bias"], dt), g),
                       stride=2, padding=3, groups=g * cin)
            y = affine(d["norm"], y, g)
            x = y + mlp(d["channel_mixer"], y, g)
        x, g = re_group(x, g, stage_groups[i])
        level = 4 - i
        for j in range(depth):
            bp = p[f"stage{i}_block{j}"]
            tm = bp["token_mixer"]
            if cfg.family == "m":
                y = rec_conv2d(
                    x,
                    _tile(jnp.asarray(tm["down_kernel"], dt), g),
                    tuple(_tile(jnp.asarray(tm[f"conv{l}_kernel"], dt), g)
                          for l in range(level + 1)),
                    level=level,
                    mode=cfg.recconv_mode,
                    upsample=cfg.recconv_upsample,
                )
                y = affine(bp["norm"], y, g)
            else:  # family "a": RecAttn2d (no inter norm — it ends in a ConvNorm)
                c = x.shape[-1] // g
                heads = 2 ** (i + 1)
                k = tm["down"]["conv"]["kernel"].shape[0]
                yd = cv({"kernel": _tile(jnp.asarray(tm["down"]["conv"]["kernel"], dt), g),
                         "bias": _tile(jnp.asarray(tm["down"]["conv"]["bias"], dt), g)},
                        x, stride=2, padding=k // 2, groups=g * c)
                qk = cv({"kernel": _tile(jnp.asarray(tm["attn"]["qk"]["conv"]["kernel"], dt), g),
                         "bias": _tile(jnp.asarray(tm["attn"]["qk"]["conv"]["bias"], dt), g)},
                        yd, groups=2 * g)
                qk = feature_map(qk, cfg.attn_kernel)
                if attn_impl == "headbatch" or i >= 3:
                    # stage 3 stays qk-first (variant 2): at n<=16 tokens the
                    # quadratic form is the measured winner and has no
                    # blockdiag analog in channel space
                    o = _packed_linear_attention(
                        qk, yd, g, heads, c // heads, variant=2 if i >= 3 else 1)
                else:
                    from recnext_tpu.ops.attention import linear_attention_blockdiag

                    o = linear_attention_blockdiag(
                        qk, yd, heads, groups=g,
                        fused_denom=(attn_impl == "blockdiag_fused"))
                o = o + cv({"kernel": _tile(jnp.asarray(tm["attn"]["pe"]["conv"]["kernel"], dt), g),
                            "bias": _tile(jnp.asarray(tm["attn"]["pe"]["conv"]["bias"], dt), g)},
                           yd, padding=1, groups=g * c)
                if nearest_upsample == "matmul":
                    o = resize_matmul(o, (x.shape[1], x.shape[2]), mode="nearest")
                else:
                    o = resize(o, (x.shape[1], x.shape[2]), mode="nearest")
                y = cv({"kernel": _tile(jnp.asarray(tm["conv"]["conv"]["kernel"], dt), g),
                        "bias": _tile(jnp.asarray(tm["conv"]["conv"]["bias"], dt), g)},
                       x + o, padding=k // 2, groups=g * c)
            y = mlp(bp["channel_mixer"], y, g)
            x = x + y

    # global pool; (B/g, g*C) -> (B, C) is a pure reshape under this packing
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(dt)
    x = x.reshape(B, cfg.embed_dim[-1])  # exact: pack order is g-major in batch
    if cfg.num_classes <= 0:
        return x
    h = p["head"]["head"]["linear"]
    return x @ jnp.asarray(h["kernel"], dt) + jnp.asarray(h["bias"], dt)
