"""ConvNeXt backbone (NHWC, flax.linen).

Behavioural mirror of the backbone the reference's configs/convnext/*
import from mmpretrain (mmcls.ConvNeXt; e.g.
mask-rcnn_convnext-t-p4-w7_fpn_amp-ms-crop-3x_coco.py): patchify stem
(4x4 stride-4 conv + LayerNorm), four stages of ConvNeXt blocks
(depthwise 7x7 -> LN -> 1x1 expand x4 -> GELU -> 1x1 project, learnable
per-channel layer scale, residual), LN + 2x2 stride-2 conv downsample
between stages, and a per-stage output LayerNorm (out_indices 0-3 for
detection). Stochastic depth is omitted (inference-faithful; the drop
rate only regularizes training).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

ARCH = {
    'tiny': ((3, 3, 9, 3), (96, 192, 384, 768)),
    'small': ((3, 3, 27, 3), (96, 192, 384, 768)),
    'base': ((3, 3, 27, 3), (128, 256, 512, 1024)),
    'large': ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3)] * 2,
                    feature_group_count=self.dim, name='dwconv')(x)
        y = nn.LayerNorm(name='norm')(y)
        y = nn.Dense(4 * self.dim, name='pwconv1')(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name='pwconv2')(y)
        gamma = self.param('gamma',
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        return x + gamma * y


class ConvNeXt(nn.Module):
    arch: str = 'tiny'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        depths, dims = ARCH[self.arch]
        x = x.astype(self.compute_dtype)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), name='stem_conv')(x)
        x = nn.LayerNorm(name='stem_norm')(x)
        outs = []
        for s, (d, c) in enumerate(zip(depths, dims)):
            if s > 0:
                x = nn.LayerNorm(name=f'down{s}_norm')(x)
                x = nn.Conv(c, (2, 2), strides=(2, 2),
                            name=f'down{s}_conv')(x)
            for b in range(d):
                x = ConvNeXtBlock(c, name=f'stage{s}_block{b}')(x)
            if s in self.out_indices:
                outs.append(nn.LayerNorm(name=f'out_norm{s}')(x))
        return tuple(outs)
