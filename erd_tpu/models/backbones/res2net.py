"""Res2Net backbone, flax.linen NHWC (frozen-BN detection form).

Behavioural mirror of /root/reference/mmdet/models/backbones/res2net.py:
Bottle2neck with scales=4 / base_width=26 hierarchical residual splits
(split conv1 output into ``scales`` groups; each 3x3 conv consumes its
split plus the previous conv's output; the last split is identity or
3x3-avg-pooled in the stride block), deep 3-conv stem and avg-down
shortcuts (reference defaults deep_stem=True, avg_down=True). BN is frozen
like the ResNet port (norm_eval detection recipe).
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26

    @nn.compact
    def __call__(self, x):
        width = int(math.floor(self.planes * (self.base_width / 64)))
        out_ch = self.planes * 4
        identity = x
        stage_start = self.downsample  # first block of a stage

        y = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                    dtype=x.dtype, name='conv1')(x)
        y = FrozenBatchNorm(width * self.scales, name='bn1')(y)
        y = nn.relu(y)
        splits = jnp.split(y, self.scales, axis=-1)
        outs = []
        sp = None
        for i in range(self.scales - 1):
            sp = splits[i] if (i == 0 or stage_start) else sp + splits[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=[torch_pad(3)] * 2, use_bias=False,
                         dtype=y.dtype, name=f'conv2_{i}')(sp)
            sp = nn.relu(FrozenBatchNorm(width, name=f'bn2_{i}')(sp))
            outs.append(sp)
        last = splits[-1]
        if stage_start and self.stride > 1:
            last = nn.avg_pool(last, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=[torch_pad(3)] * 2)
        outs.append(last)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=y.dtype,
                    name='conv3')(y)
        y = FrozenBatchNorm(out_ch, name='bn3')(y)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=x.dtype, name='downsample_conv')(
                identity)
            identity = FrozenBatchNorm(out_ch,
                                       name='downsample_bn')(identity)
        return nn.relu(y + identity)


class Res2Net(nn.Module):
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stage_blocks = ARCH[self.depth]
        x = x.astype(self.compute_dtype)
        # deep stem: 3x3/s2 32 -> 3x3 32 -> 3x3 64
        for i, (ch, s) in enumerate(((32, 2), (32, 1), (64, 1))):
            x = nn.Conv(ch, (3, 3), strides=(s, s),
                        padding=[torch_pad(3)] * 2, use_bias=False,
                        dtype=x.dtype, name=f'stem_conv{i}')(x)
            x = nn.relu(FrozenBatchNorm(ch, name=f'stem_bn{i}')(x))
        x = max_pool_torch(x, 3, 2, 1)
        outs = []
        planes = 64
        for stage, num_blocks in enumerate(stage_blocks):
            stride = self.strides[stage]
            for b in range(num_blocks):
                needs_ds = b == 0 and (stride != 1 or
                                       x.shape[-1] != planes * 4)
                x = Bottle2neck(planes, stride=stride if b == 0 else 1,
                                downsample=needs_ds, scales=self.scales,
                                base_width=self.base_width,
                                name=f'layer{stage + 1}_block{b}')(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
