"""Double-Head R-CNN bbox head: conv branch for regression, fc branch
for classification.

Behavioural mirror of
/root/reference/mmdet/models/roi_heads/bbox_heads/double_bbox_head.py +
double_roi_head.py with configs/double_heads/dh-faster-rcnn_r50_fpn_1x:
the REG branch sees RoI features extracted from rois enlarged by
reg_roi_scale_factor(=1.3) and runs BasicResBlock(256->1024) + 4
bottlenecks + GAP + fc_reg; the CLS branch flattens the unscaled RoI
features through 2 fc(1024) + fc_cls; both losses weighted 2.0.
Documented deviations: GroupNorm replaces BN inside the head (no mutable
batch stats under jit; detection heads here are norm-frozen by
convention) and plain L1 replaces SmoothL1 (matches the repo-wide R-CNN
regression loss).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..layers import torch_pad


def _gn(c):
    import math
    return nn.GroupNorm(num_groups=math.gcd(32, c))


class BasicResBlock(nn.Module):
    """3x3 (channel-keeping) + 1x1 expand, identity via 1x1 shortcut."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = nn.relu(_gn(cin)(nn.Conv(cin, (3, 3),
                                     padding=[torch_pad(3)] * 2,
                                     use_bias=False, name='conv1')(x)))
        y = _gn(self.out_channels)(nn.Conv(self.out_channels, (1, 1),
                                           use_bias=False,
                                           name='conv2')(y))
        sc = _gn(self.out_channels)(nn.Conv(self.out_channels, (1, 1),
                                            use_bias=False,
                                            name='conv_identity')(x))
        return nn.relu(y + sc)


class _HeadBottleneck(nn.Module):
    """Bottleneck(planes=C/4) as used by the conv branch."""
    channels: int

    @nn.compact
    def __call__(self, x):
        mid = self.channels // 4
        y = nn.relu(_gn(mid)(nn.Conv(mid, (1, 1), use_bias=False,
                                     name='conv1')(x)))
        y = nn.relu(_gn(mid)(nn.Conv(mid, (3, 3),
                                     padding=[torch_pad(3)] * 2,
                                     use_bias=False, name='conv2')(y)))
        y = _gn(self.channels)(nn.Conv(self.channels, (1, 1),
                                       use_bias=False, name='conv3')(y))
        return nn.relu(x + y)


class DoubleConvFCBBoxHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, x_cls, x_reg):
        # conv branch -> regression
        y = BasicResBlock(self.conv_out_channels, name='res_block')(x_reg)
        for i in range(self.num_convs):
            y = _HeadBottleneck(self.conv_out_channels,
                                name=f'conv_branch{i}')(y)
        y = y.mean(axis=(1, 2))
        reg = nn.Dense(4 * self.num_classes,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(y)
        # fc branch -> classification
        z = x_cls.reshape(x_cls.shape[0], -1)
        for i in range(self.num_fcs):
            z = nn.relu(nn.Dense(self.fc_out_channels,
                                 kernel_init=nn.initializers.xavier_uniform(),
                                 name=f'fc_branch{i}')(z))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(z)
        return cls, reg


def scale_rois(rois, scale_factor):
    """Enlarge rois about their centers (roi_align roi_scale_factor)."""
    cx = (rois[..., 0] + rois[..., 2]) / 2
    cy = (rois[..., 1] + rois[..., 3]) / 2
    hw = (rois[..., 2] - rois[..., 0]) * scale_factor / 2
    hh = (rois[..., 3] - rois[..., 1]) * scale_factor / 2
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)
