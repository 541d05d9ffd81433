"""HourglassNet backbone (CornerNet/CentripetalNet), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/hourglass.py:
stem 7x7/s2 (128ch) + BasicBlock stride-2 (cur_channel), then
``num_stacks`` recursive hourglass modules (downsample_times levels with
``stage_channels``/``stage_blocks``), each followed by a 3x3 out-conv;
between stacks the 1x1-conv remix: inter = relu(bn(conv(inter)) +
bn(conv(out))) -> one BasicBlock. Train-time BatchNorm throughout (the
reference trains hourglass BN; torch momentum 0.1 -> flax 0.9).
HourglassNet-104 = num_stacks 2, channels (256,256,384,384,384,512),
blocks (2,2,2,2,2,4). Returns one stride-4 feature per stack.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p)] * 2, use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x) if self.act else x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _ConvBN(self.features, 3, self.stride, name='conv1')(x, train)
        y = _ConvBN(self.features, 3, 1, act=False, name='conv2')(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride, act=False,
                               name='downsample')(x, train)
        return nn.relu(y + identity)


class ResLayer(nn.Module):
    features: int
    num_blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = BasicBlock(self.features,
                           self.stride if i == 0 else 1,
                           name=f'block{i}')(x, train)
        return x


class HourglassModule(nn.Module):
    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_ch = self.stage_channels[0]
        next_ch = self.stage_channels[1]
        cur_bl = self.stage_blocks[0]
        next_bl = self.stage_blocks[1]
        up1 = ResLayer(cur_ch, cur_bl, name='up1')(x, train)
        low1 = ResLayer(next_ch, cur_bl, stride=2, name='low1')(x, train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:],
                                   name='low2')(low1, train)
        else:
            low2 = ResLayer(next_ch, next_bl, name='low2')(low1, train)
        low3 = ResLayer(cur_ch, cur_bl, name='low3')(low2, train)
        h, w = low3.shape[-3], low3.shape[-2]
        up2 = jax.image.resize(low3, low3.shape[:-3] + (h * 2, w * 2,
                                                        low3.shape[-1]),
                               method='nearest')
        return up1 + up2


class HourglassNet(nn.Module):
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    compute_dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_ch = self.stage_channels[0]
        x = _ConvBN(cur_ch // 2, 7, 2, name='stem_conv')(x, train)
        x = BasicBlock(cur_ch, stride=2, name='stem_block')(x, train)

        outs = []
        inter = x
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks,
                                 name=f'hourglass{i}')(inter, train)
            out = _ConvBN(self.feat_channel, 3,
                          name=f'out_conv{i}')(hg, train)
            outs.append(out)
            if i < self.num_stacks - 1:
                a = _ConvBN(cur_ch, 1, act=False,
                            name=f'remix_inter{i}')(inter, train)
                b = _ConvBN(cur_ch, 1, act=False,
                            name=f'remix_out{i}')(out, train)
                inter = ResLayer(cur_ch, 1,
                                 name=f'inter_block{i}')(nn.relu(a + b),
                                                         train)
        return outs
