"""Additional necks: PAFPN and ChannelMapper.

Behavioural mirrors of /root/reference/mmdet/models/necks/pafpn.py (FPN +
bottom-up path aggregation with stride-2 downsample convs) and
channel_mapper.py (per-level 3x3 conv projection + optional extra levels,
used by the DETR family).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import nearest_upsample_to, torch_pad


class PAFPN(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: str = ''

    @nn.compact
    def __call__(self, inputs):
        used = list(range(self.start_level, len(inputs)))
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}')(inputs[i])
            for i in used
        ]
        # top-down
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nearest_upsample_to(
                laterals[i], laterals[i - 1].shape[-3:-1])
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    name=f'fpn_conv_{j}')(laterals[j])
            for j in range(len(laterals))
        ]
        # bottom-up path aggregation
        for i in range(len(inter) - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[torch_pad(3)] * 2,
                           name=f'downsample_conv_{i}')(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    name=f'pafpn_conv_{j}')(inter[j])
            for j in range(1, len(inter))
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class ChannelMapper(nn.Module):
    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 3
    num_outs: int = 0  # 0 -> len(in_channels)
    num_groups_gn: int = 32
    use_norm: bool = True

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        outs = []
        for i, x in enumerate(inputs):
            y = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        padding=[torch_pad(self.kernel_size)] * 2,
                        name=f'conv_{i}')(x)
            if self.use_norm:
                y = nn.GroupNorm(num_groups=min(self.num_groups_gn, self.out_channels),
                                 name=f'gn_{i}')(y)
            outs.append(y)
        n_extra = (self.num_outs or len(inputs)) - len(inputs)
        src = inputs[-1]
        for k in range(n_extra):
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[torch_pad(3)] * 2,
                        name=f'extra_conv_{k}')(src)
            if self.use_norm:
                y = nn.GroupNorm(num_groups=min(self.num_groups_gn, self.out_channels),
                                 name=f'extra_gn_{k}')(y)
            outs.append(y)
            src = y
        return tuple(outs)
