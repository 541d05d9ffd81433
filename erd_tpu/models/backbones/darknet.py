"""Darknet-53 backbone (YOLOv3), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/darknet.py:
conv32 stem, five stride-2 stages with (1, 2, 8, 8, 4) residual blocks,
BatchNorm + LeakyReLU(0.1), out_indices (3, 4, 5) -> (256, 512, 1024)
channels. Uses train-time BatchNorm (running stats in the 'batch_stats'
collection, updated when ``train=True``) — the engine threads the mutable
state via ``loss_and_state``.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import torch_pad


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[torch_pad(self.kernel)] * 2, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return leaky(x)


class DarkBlock(nn.Module):
    channels: int  # block output channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.channels // 2, 1, name='conv1')(x, train)
        y = ConvBN(self.channels, 3, name='conv2')(y, train)
        return x + y


class Darknet(nn.Module):
    depth: int = 53
    out_indices: Tuple[int, ...] = (3, 4, 5)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.depth == 53
        x = x.astype(self.compute_dtype)
        x = ConvBN(32, 3, name='conv1')(x, train)
        stage_blocks = (1, 2, 8, 8, 4)
        channels = (64, 128, 256, 512, 1024)
        outs = []
        for s, (nb, ch) in enumerate(zip(stage_blocks, channels), start=1):
            x = ConvBN(ch, 3, stride=2, name=f'stage{s}_down')(x, train)
            for b in range(nb):
                x = DarkBlock(ch, name=f'stage{s}_block{b}')(x, train)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)
