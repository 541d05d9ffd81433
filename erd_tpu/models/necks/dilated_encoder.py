"""DilatedEncoder neck (YOLOF), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/necks/dilated_encoder.py:
1x1 lateral conv + BN, 3x3 fpn conv + BN, then ``num_residual_blocks``
dilated bottlenecks (1x1 reduce -> 3x3 dilated -> 1x1 expand, each
conv+BN+ReLU, residual add) with dilations ``block_dilations``. Train-time
BatchNorm (torch momentum 0.1 -> flax 0.9).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..layers import torch_pad


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(pad, pad)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x) if self.act else x


class DilatedEncoder(nn.Module):
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Tuple[int, ...] = (2, 4, 6, 8)

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = _ConvBN(self.out_channels, 1, act=False,
                    name='lateral')(feat, train)
        x = _ConvBN(self.out_channels, 3, act=False, name='fpn')(x, train)
        for i, d in enumerate(self.block_dilations):
            y = _ConvBN(self.block_mid_channels, 1,
                        name=f'block{i}_reduce')(x, train)
            y = _ConvBN(self.block_mid_channels, 3, dilation=d,
                        name=f'block{i}_dilated')(y, train)
            y = _ConvBN(self.out_channels, 1,
                        name=f'block{i}_expand')(y, train)
            x = x + y
        return x
