"""ResNeSt backbone (Split-Attention Networks), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/resnest.py:
deep 3-conv stem + avg-down shortcuts (ResNet-D base), bottlenecks whose
3x3 is a SplitAttentionConv2d: the input expands to
``width * radix`` channels (groups * radix grouped conv), the radix
splits are summed, squeezed through an inter-channel fc
(max(width*radix//4, 32) channels), and re-weighted by an r-softmax over
the radix dimension (radix=2, groups=1, base_width=4 defaults). Frozen
BN as in the other detection backbones.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SplitAttentionConv(nn.Module):
    channels: int
    radix: int = 2
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        c = self.channels
        r = self.radix
        y = nn.Conv(c * r, (3, 3), padding=[torch_pad(3)] * 2,
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=x.dtype, name='conv')(x)
        y = FrozenBatchNorm(c * r, name='bn0')(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))        # (B, C)
        inter = max(c * r // 4, 32)
        z = nn.relu(FrozenBatchNorm(inter, name='bn1')(
            nn.Dense(inter, name='fc1')(gap)))
        att = nn.Dense(c * r, name='fc2')(z).reshape(b, r, c)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=1) \
            .astype(y.dtype)                               # r-softmax
        return (splits * att[:, None, None].transpose(0, 1, 2, 3, 4)
                .reshape(b, 1, 1, r, c)).sum(axis=3)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    groups: int = 1
    base_width: int = 4

    @nn.compact
    def __call__(self, x):
        # mmdet resnest.py: width = planes when groups == 1, else the
        # ResNeXt-style widened group width
        if self.groups == 1:
            width = self.planes
        else:
            width = int(math.floor(
                self.planes * (self.base_width / 64))) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=x.dtype,
                    name='conv1')(x)
        y = nn.relu(FrozenBatchNorm(width, name='bn1')(y))
        y = SplitAttentionConv(width, radix=self.radix,
                               groups=self.groups, name='conv2')(y)
        if self.stride > 1:  # avd: 3x3 avg pool after the SA conv
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=[torch_pad(3)] * 2)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=y.dtype,
                    name='conv3')(y)
        y = FrozenBatchNorm(out_ch, name='bn3')(y)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity,
                                       (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=x.dtype,
                               name='downsample_conv')(identity)
            identity = FrozenBatchNorm(out_ch,
                                       name='downsample_bn')(identity)
        return nn.relu(y + identity)


class ResNeSt(nn.Module):
    depth: int = 50
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stage_blocks = ARCH[self.depth]
        x = x.astype(self.compute_dtype)
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
                x = ResNeStBottleneck(
                    planes, stride=stride if b == 0 else 1,
                    downsample=needs_ds, radix=self.radix,
                    groups=self.groups, base_width=self.base_width,
                    name=f'layer{stage + 1}_block{b}')(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
