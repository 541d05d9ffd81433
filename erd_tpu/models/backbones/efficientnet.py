"""EfficientNet backbone (B0-B3 scalings), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/efficientnet.py:
swish stem (32ch, 3x3/s2), 7 MBConv stages
(expand 1/6/6/6/6/6/6, kernels 3/3/5/3/5/5/3, strides 1/2/2/2/1/2/1,
repeats 1/2/2/3/3/4/1 at B0) with squeeze-excitation ratio 1/4 of the
INPUT channels (the EfficientNet convention), width/depth compound
scaling per variant, train-time BatchNorm. Detection out_indices default
(2, 3, 4, 5) -> strides 8, 16, 32 + the stage-6 stride-32 tail (the
reference's efficientdet-style selection uses (3, 4, 5)).
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expand, channels, repeats, stride, kernel)
B0_ARCH = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
           (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
           (6, 320, 1, 1, 3))
SCALINGS = {'b0': (1.0, 1.0), 'b1': (1.0, 1.1), 'b2': (1.1, 1.2),
            'b3': (1.2, 1.4)}


def round_ch(ch, mult, divisor=8):
    ch = ch * mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


class _ConvBNSwish(nn.Module):
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
                         epsilon=1e-3, name='bn')(x)
        return nn.swish(x) if self.act else x


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        y = x
        if self.expand != 1:
            y = _ConvBNSwish(hidden, 1, name='expand')(y, train)
        y = _ConvBNSwish(hidden, self.kernel, self.stride, groups=hidden,
                         name='depthwise')(y, train)
        # squeeze-excitation: bottleneck = block INPUT channels // 4
        se_ch = max(1, cin // 4)
        s = y.mean(axis=(1, 2))
        s = nn.swish(nn.Dense(se_ch, name='se_fc1')(s))
        s = nn.sigmoid(nn.Dense(hidden, name='se_fc2')(s))
        y = y * s[:, None, None, :]
        y = _ConvBNSwish(self.features, 1, act=False,
                         name='project')(y, train)
        if self.stride == 1 and cin == self.features:
            y = x + y
        return y


class EfficientNet(nn.Module):
    arch: str = 'b0'
    out_indices: Tuple[int, ...] = (2, 3, 4, 5)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        wm, dm = SCALINGS[self.arch]
        x = _ConvBNSwish(round_ch(32, wm), 3, 2, name='stem')(x, train)
        outs = []
        for si, (t, ch, n, s, k) in enumerate(B0_ARCH):
            ch = round_ch(ch, wm)
            reps = int(math.ceil(n * dm))
            for bi in range(reps):
                x = MBConv(ch, t, k, s if bi == 0 else 1,
                           name=f'stage{si}_block{bi}')(x, train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)
