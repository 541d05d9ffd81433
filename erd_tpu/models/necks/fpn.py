"""Feature Pyramid Network neck (NHWC), flax.linen.

Mirrors /root/reference/mmdet/models/necks/fpn.py for the GFL configuration:
lateral 1x1 convs, top-down nearest-neighbour sum, 3x3 output convs, and
extra P6/P7 levels from stride-2 convs applied ``on_output`` (no relu in
between, matching relu_before_extra_convs=False).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import WSConv, nearest_upsample_to, torch_pad


class FPN(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    add_extra_convs: str = 'on_output'  # '' | 'on_input' | 'on_output'
    relu_before_extra_convs: bool = False
    # configs/gn + gn+ws: neck=dict(norm_cfg=GN[, conv_cfg=ConvWS]) —
    # GN(32) after every lateral/fpn/extra conv, bias absorbed
    norm: str = ''  # '' | 'gn'
    conv_ws: bool = False

    def _conv(self, k, stride=1, name=None, dtype=None):
        if self.conv_ws:
            return WSConv(self.out_channels, kernel_size=k, strides=stride,
                          use_bias=not self.norm, name=name)
        return nn.Conv(self.out_channels, (k, k),
                       strides=(stride, stride),
                       padding=[torch_pad(k)] * 2,
                       use_bias=not self.norm, dtype=dtype, name=name)

    def _norm(self, x, name):
        if self.norm == 'gn':
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=x.dtype,
                             name=name)(x)
        return x

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        used = list(range(self.start_level, len(inputs)))

        laterals = [
            self._norm(self._conv(1, dtype=inputs[i].dtype,
                                  name=f'lateral_{i}')(inputs[i]),
                       f'lateral_gn_{i}')
            for i in used
        ]

        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            target_hw = laterals[i - 1].shape[-3:-1]
            laterals[i - 1] = laterals[i - 1] + nearest_upsample_to(
                laterals[i], target_hw)

        outs = [
            self._norm(self._conv(3, dtype=laterals[j].dtype,
                                  name=f'fpn_conv_{j}')(laterals[j]),
                       f'fpn_gn_{j}')
            for j in range(len(laterals))
        ]

        if self.num_outs > len(outs):
            n_extra = self.num_outs - len(outs)
            if not self.add_extra_convs:
                for _ in range(n_extra):
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                src = inputs[-1] if self.add_extra_convs == 'on_input' \
                    else outs[-1]
                for k in range(n_extra):
                    if k > 0:
                        src = outs[-1]
                        if self.relu_before_extra_convs:
                            src = nn.relu(src)
                    outs.append(self._norm(
                        self._conv(3, stride=2, dtype=src.dtype,
                                   name=f'extra_conv_{k}')(src),
                        f'extra_gn_{k}'))
        return tuple(outs)
