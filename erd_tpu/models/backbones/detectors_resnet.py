"""DetectoRS ResNet: Switchable Atrous Convolution + RFP feedback input.

Behavioural mirror of /root/reference/mmdet/models/backbones/
detectors_resnet.py + mmcv SAConv2d (used via the reference's
conv_cfg=dict(type='SAC', use_deform=False)):

- *SAC*: each stage-2..4 bottleneck 3x3 becomes
  S(x) * conv(w, d=1) + (1 - S(x)) * conv(w + dw, d=3), with the switch
  S = sigmoid(1x1 conv(5x5-avg-pooled x)), a zero-init weight delta dw,
  and 1x1 pre/post global-context convs added to the input/output;
- *RFP*: ``rfp_feats`` (one per stage, from the neck's feedback path)
  enter each stage through a zero-init 1x1 conv added to the stage input
  (detectors_resnet.py rfp_inplanes path), so step 1 (no feedback)
  reproduces the plain backbone exactly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SAConv(nn.Module):
    """Switchable atrous 3x3 conv (weight-shared d=1 / d=3 branches)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        weight = self.param('kernel', nn.initializers.he_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        delta = self.param('weight_diff', nn.initializers.zeros,
                           (3, 3, cin, self.features), jnp.float32)
        # switch: 5x5 avg pool -> 1x1 conv -> sigmoid
        sw_in = nn.avg_pool(x, (5, 5), strides=(1, 1),
                            padding=[(2, 2)] * 2)
        switch = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones, name='switch')(sw_in))
        # pre-context: global avg + 1x1, added to the input
        pre = nn.Conv(cin, (1, 1), kernel_init=nn.initializers.zeros,
                      name='pre_context')(x.mean((1, 2), keepdims=True))
        x = x + pre

        def conv(w, d):
            # conv in the activation dtype (cast_compute_params may hand
            # the kernels in bf16) with f32 accumulation
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)

        y1 = conv(weight, 1)
        y3 = conv(weight + delta, 3)
        if self.stride > 1:
            sw = switch[:, ::self.stride, ::self.stride]
        else:
            sw = switch
        y = sw * y1 + (1 - sw) * y3
        post = nn.Conv(self.features, (1, 1),
                       kernel_init=nn.initializers.zeros,
                       name='post_context')(y.mean((1, 2), keepdims=True))
        return (y + post).astype(x.dtype)


class SACBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=x.dtype,
                    name='conv1')(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name='bn1')(y))
        y = SAConv(self.planes, stride=self.stride, name='conv2')(y)
        y = nn.relu(FrozenBatchNorm(self.planes, name='bn2')(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=y.dtype,
                    name='conv3')(y)
        y = FrozenBatchNorm(out_ch, name='bn3')(y)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=x.dtype,
                               name='downsample_conv')(x)
            identity = FrozenBatchNorm(out_ch,
                                       name='downsample_bn')(identity)
        return nn.relu(y + identity)


class DetectoRSResNet(nn.Module):
    depth: int = 50
    sac_stages: Tuple[bool, ...] = (False, True, True, True)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rfp_feats=None):
        from .resnet import Bottleneck
        stage_blocks = ARCH[self.depth]
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[torch_pad(7)] * 2, use_bias=False,
                    dtype=x.dtype, name='stem_conv')(x)
        x = nn.relu(FrozenBatchNorm(64, name='stem_bn')(x))
        x = max_pool_torch(x, 3, 2, 1)
        outs = []
        planes = 64
        for stage, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage == 0 else 2
            if rfp_feats is not None and rfp_feats[stage] is not None:
                x = x + nn.Conv(x.shape[-1], (1, 1),
                                kernel_init=nn.initializers.zeros,
                                name=f'rfp_conv_{stage}')(
                    rfp_feats[stage]).astype(x.dtype)
            for b in range(num_blocks):
                needs = b == 0 and (stride != 1 or
                                    x.shape[-1] != planes * 4)
                if self.sac_stages[stage]:
                    x = SACBottleneck(
                        planes, stride=stride if b == 0 else 1,
                        downsample=needs,
                        name=f'layer{stage + 1}_block{b}')(x)
                else:
                    x = Bottleneck(planes, stride=stride if b == 0 else 1,
                                   downsample=needs,
                                   name=f'layer{stage + 1}_block{b}')(x)
            outs.append(x)
            planes *= 2
        return tuple(outs)
