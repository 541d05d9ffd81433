"""CSPDarknet backbone (YOLOX), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/csp_darknet.py:
Focus stem (space-to-depth + conv), CSP stages with residual bottlenecks,
SPP block in the last stage, SiLU activations, train-time BatchNorm.
``deepen/widen`` factors select the YOLOX-s/m/l variants.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import torch_pad


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[torch_pad(self.kernel)] * 2, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name='bn')(x)
        return nn.silu(x)


class DarknetBottleneck(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.features, 1, name='conv1')(x, train)
        y = ConvBNSiLU(self.features, 3, name='conv2')(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features \
            else y


class CSPLayer(nn.Module):
    features: int
    num_blocks: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        a = ConvBNSiLU(mid, 1, name='main_conv')(x, train)
        b = ConvBNSiLU(mid, 1, name='short_conv')(x, train)
        for i in range(self.num_blocks):
            a = DarknetBottleneck(mid, self.shortcut,
                                  name=f'block{i}')(a, train)
        return ConvBNSiLU(self.features, 1, name='final_conv')(
            jnp.concatenate([a, b], axis=-1), train)


class SPPBottleneck(nn.Module):
    features: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvBNSiLU(mid, 1, name='conv1')(x, train)
        pools = [x]
        for k in self.kernel_sizes:
            pools.append(nn.max_pool(x, (k, k), strides=(1, 1),
                                     padding=((k // 2, k // 2),
                                              (k // 2, k // 2))))
        return ConvBNSiLU(self.features, 1, name='conv2')(
            jnp.concatenate(pools, axis=-1), train)


class Focus(nn.Module):
    """Space-to-depth stem: (B, H, W, C) -> (B, H/2, W/2, 4C) -> conv."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBNSiLU(self.features, 3, name='conv')(x, train)


class CSPDarknet(nn.Module):
    deepen: float = 0.33   # yolox-s
    widen: float = 0.5
    out_indices: Tuple[int, ...] = (2, 3, 4)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(c * self.widen), 16)

        def d(n):
            return max(round(n * self.deepen), 1)

        x = x.astype(self.compute_dtype)
        x = Focus(w(64), name='stem')(x, train)
        outs = []
        stage_cfg = [  # (channels, blocks, use_spp)
            (w(128), d(3), False),
            (w(256), d(9), False),
            (w(512), d(9), False),
            (w(1024), d(3), True),
        ]
        for i, (ch, nb, spp) in enumerate(stage_cfg, start=1):
            x = ConvBNSiLU(ch, 3, stride=2, name=f'stage{i}_down')(x, train)
            if spp:
                x = SPPBottleneck(ch, name=f'stage{i}_spp')(x, train)
            x = CSPLayer(ch, nb, shortcut=not spp,
                         name=f'stage{i}_csp')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
