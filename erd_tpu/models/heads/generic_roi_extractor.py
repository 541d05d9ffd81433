"""GRoIE: Generic RoI Extraction (sum over ALL pyramid levels).

Behavioural mirror of
/root/reference/mmdet/models/roi_heads/roi_extractors/generic_roi_extractor.py
+ configs/groie/*: instead of routing each RoI to one FPN level by
scale, RoIAlign runs on EVERY level, each patch passes a shared 5x5
ConvModule (pre_cfg), the per-level patches are SUMMED, and a
GeneralizedAttention '0100' module (post_cfg, 6 heads, kv_stride 2)
refines the aggregate.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ..layers import torch_pad
from ..plugins import GeneralizedAttention


class GenericRoIExtractor(nn.Module):
    out_channels: int = 256
    out_size: int = 7
    strides: Sequence[int] = (4, 8, 16, 32)
    sampling_ratio: int = 2

    @nn.compact
    def __call__(self, feats, rois):
        """feats: per-level (H_l, W_l, C); rois (R, 4) -> (R, s, s, C)."""
        pre = nn.Conv(self.out_channels, (5, 5),
                      padding=[torch_pad(5)] * 2, name='pre_conv')
        acc = None
        for f, s in zip(feats, self.strides):
            patch = roi_align(f.astype(jnp.float32), rois, self.out_size,
                              1.0 / s, self.sampling_ratio)
            patch = nn.relu(pre(patch))
            acc = patch if acc is None else acc + patch
        post = GeneralizedAttention(num_heads=6, kv_stride=2,
                                    attention_type='0100',
                                    name='post_attention')
        return post(acc)
