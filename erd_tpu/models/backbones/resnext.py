"""ResNeXt backbone (grouped-conv bottlenecks).

Mirrors /root/reference/mmdet/models/backbones/resnext.py: bottleneck width
= planes * (base_width/64) * groups rounding, 3x3 conv grouped. Implemented
with XLA's ``feature_group_count`` (nn.Conv feature_group_count), NHWC.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad
from .resnet import ARCH_SETTINGS


class ResNeXtBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    base_width: int = 4
    # (modulated) deformable 3x3 — the reference's dcn stage plugin on
    # ResNeXt (configs/gfl/gfl_x101-32x4d-dconv-c4-c5_fpn_ms-2x_coco.py)
    dcn: bool = False
    dcn_modulated: bool = True

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name='conv1')(x)
        y = FrozenBatchNorm(width, name='bn1')(y)
        y = nn.relu(y)
        if self.dcn:
            from ...ops.deform_conv import ModulatedDeformConv
            y = ModulatedDeformConv(width, kernel_size=3,
                                    strides=self.stride,
                                    modulated=self.dcn_modulated,
                                    feature_group_count=self.groups,
                                    name='conv2')(y)
        else:
            y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                        padding=[torch_pad(3)] * 2,
                        feature_group_count=self.groups, use_bias=False,
                        name='conv2')(y)
        y = FrozenBatchNorm(width, name='bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name='conv3')(y)
        y = FrozenBatchNorm(out_ch, name='bn3')(y)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name='downsample_conv')(x)
            identity = FrozenBatchNorm(out_ch, name='downsample_bn')(identity)
        return nn.relu(y + identity)


class ResNeXt(nn.Module):
    depth: int = 101
    groups: int = 32
    base_width: int = 4
    base_channels: int = 64
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    # per-stage deformable-conv plugin (reference stage_with_dcn)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[torch_pad(7)] * 2, use_bias=False,
                    name='stem_conv')(x)
        x = FrozenBatchNorm(self.base_channels, name='stem_bn')(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        outs = []
        planes = self.base_channels
        for stage, num_blocks in enumerate(stage_blocks):
            stride = self.strides[stage]
            for b in range(num_blocks):
                needs_ds = b == 0 and (stride != 1 or
                                       x.shape[-1] != planes * 4)
                x = ResNeXtBottleneck(
                    planes, stride=stride if b == 0 else 1,
                    downsample=needs_ds, groups=self.groups,
                    base_width=self.base_width,
                    dcn=bool(self.dcn_stages[stage]),
                    dcn_modulated=self.dcn_modulated,
                    name=f'layer{stage + 1}_block{b}')(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
