"""Feature Pyramid Network neck — the mm-ecosystem FPN the reference plugs its
backbones into (detection: Mask R-CNN FPN, /root/reference/detection/configs/
mask_rcnn_recnext_m3_fpn_1x_coco.py; segmentation: Semantic FPN,
/root/reference/segmentation/configs/_base_/models/fpn_r50.py neck=FPN).

Takes the backbone pyramid [C2, C3, C4, C5] from RecNext.features() and produces
num_outs levels of out_channels maps: 1x1 laterals, top-down nearest-x2 upsample + add,
3x3 output convs, optional extra levels via stride-2 maxpool (detection P6)."""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from recnext_tpu.models.layers import Conv2d
from recnext_tpu.ops.resize import resize


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        n = len(feats)
        laterals = [
            Conv2d(self.out_channels, 1, use_bias=True, dtype=self.dtype,
                   name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(n - 1, 0, -1):
            up = resize(laterals[i], laterals[i - 1].shape[1:3], mode="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            Conv2d(self.out_channels, 3, padding=1, use_bias=True, dtype=self.dtype,
                   name=f"fpn_{i}")(laterals[i])
            for i in range(n)
        ]
        # extra levels (e.g. P6 for detection) via stride-2 max pool on the last out
        while len(outs) < self.num_outs:
            x = outs[-1]
            outs.append(nn.max_pool(x, (1, 1), strides=(2, 2)))
        return outs
