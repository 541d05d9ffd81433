"""HRNet backbone, flax.linen NHWC (frozen-BN detection form).

Behavioural mirror of /root/reference/mmdet/models/backbones/hrnet.py
(HRNetV2p-W18/32/40 as used with the HRFPN neck): two-conv stride-2 stem,
stage1 = 4 ResNet bottlenecks at 64 planes, then parallel multi-resolution
branches with per-stage transitions and full cross-resolution fusion
(1x1-conv + nearest upsample for up paths; chains of stride-2 3x3 convs
for down paths), stage module counts (1, 4, 3) and 4 BasicBlocks per
branch per module. Outputs the 4 branch maps (strides 4/8/16/32).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, torch_pad
from .resnet import BasicBlock, Bottleneck

WIDTH_CHANNELS = {18: (18, 36, 72, 144), 32: (32, 64, 128, 256),
                  40: (40, 80, 160, 320)}


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[torch_pad(self.kernel)] * 2, use_bias=False,
                    dtype=x.dtype, name='conv')(x)
        x = FrozenBatchNorm(self.features, name='bn')(x)
        return nn.relu(x) if self.act else x


class HRModule(nn.Module):
    """num_branches parallel BasicBlock chains + full fusion."""
    channels: Tuple[int, ...]
    num_blocks: int = 4

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        feats = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i],
                               name=f'branch{i}_block{b}')(x)
            feats.append(x)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = feats[j]
                if j > i:       # upsample j -> i
                    y = _ConvBN(self.channels[i], 1, act=False,
                                name=f'fuse_{i}_{j}')(y)
                    th, tw = feats[i].shape[-3], feats[i].shape[-2]
                    y = jax.image.resize(
                        y, y.shape[:-3] + (th, tw, y.shape[-1]),
                        method='nearest')
                elif j < i:     # chain of stride-2 convs j -> i
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = _ConvBN(ch, 3, 2, act=not last,
                                    name=f'fuse_{i}_{j}_{k}')(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    width: int = 32
    num_modules: Tuple[int, ...] = (1, 4, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chs = WIDTH_CHANNELS[self.width]
        x = x.astype(self.compute_dtype)
        x = _ConvBN(64, 3, 2, name='stem1')(x)
        x = _ConvBN(64, 3, 2, name='stem2')(x)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0),
                           name=f'layer1_block{b}')(x)

        xs = [x]
        for stage in range(3):
            n_br = stage + 2
            target = chs[:n_br]
            # transition: adapt existing branches + create the new one
            new_xs = []
            for i in range(n_br):
                if i < len(xs):
                    if xs[i].shape[-1] != target[i]:
                        new_xs.append(_ConvBN(
                            target[i], 3,
                            name=f't{stage}_branch{i}')(xs[i]))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(_ConvBN(
                        target[i], 3, 2,
                        name=f't{stage}_branch{i}')(xs[-1]))
            xs = new_xs
            for m in range(self.num_modules[stage]):
                xs = HRModule(target, name=f'stage{stage + 2}_m{m}')(xs)
        return tuple(xs)
