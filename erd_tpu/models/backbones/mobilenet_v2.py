"""MobileNetV2 backbone, flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/mobilenet_v2.py:
32-ch stem (3x3/s2, BN, ReLU6), 7 inverted-residual stages with
arch_settings [[1,16,1,1],[6,24,2,2],[6,32,3,2],[6,64,4,2],[6,96,3,1],
[6,160,3,2],[6,320,1,1]] (expand_ratio, channels, blocks, stride), default
detection out_indices (1, 2, 4, 7) -> C2..C5 channels (24, 32, 96, 1280
with the trailing 1x1 1280 conv counted as stage 7). Train-time BN.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p)] * 2, feature_group_count=self.groups,
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return jnp.clip(x, 0.0, 6.0) if self.act else x


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand_ratio: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = _ConvBNReLU6(hidden, 1, name='expand')(y, train)
        y = _ConvBNReLU6(hidden, 3, self.stride, groups=hidden,
                         name='depthwise')(y, train)
        y = _ConvBNReLU6(self.features, 1, act=False, name='project')(y,
                                                                      train)
        if self.stride == 1 and cin == self.features:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Tuple[int, ...] = (1, 2, 4, 7)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNReLU6(make_divisible(32 * self.widen_factor), 3, 2,
                         name='stem')(x, train)
        outs = []
        for si, (t, c, n, s) in enumerate(ARCH):
            ch = make_divisible(c * self.widen_factor)
            for bi in range(n):
                x = InvertedResidual(ch, s if bi == 0 else 1, t,
                                     name=f'layer{si + 1}_{bi}')(x, train)
            if si in self.out_indices:
                outs.append(x)
        if 7 in self.out_indices:
            ch1280 = int(1280 * self.widen_factor) \
                if self.widen_factor > 1.0 else 1280
            x = _ConvBNReLU6(ch1280, 1, name='conv2')(x, train)
            outs.append(x)
        return tuple(outs)
