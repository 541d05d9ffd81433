"""ResNet backbone family (NHWC, frozen-BN), flax.linen.

Behavioural mirror of /root/reference/mmdet/models/backbones/resnet.py for the
detection use case: 'pytorch'-style bottlenecks (stride on the 3x3 conv),
7x7/2 stem + 3x3/2 maxpool, 4 stages returning (C2..C5), ``norm_eval``
semantics baked in via FrozenBatchNorm, and ``frozen_stages`` realised as an
optimizer mask (see engine/optim.py) rather than mutable module state.
Weight layout is import-compatible with torchvision/mmdet checkpoints
(see models/weight_import.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad

ARCH_SETTINGS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


def _norm(kind, ch, name):
    """'frozen_bn' (default, reference norm_eval) or 'gn' (configs/gn,
    gn+ws: norm_cfg=dict(type='GN', num_groups=32))."""
    if kind == 'gn':
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
    return FrozenBatchNorm(ch, name=name)


def _conv(ws, features, k, stride=1, dilation=1, dtype=None, name=None):
    """Plain conv or weight-standardized conv (configs/gn+ws
    conv_cfg=dict(type='ConvWS')), bias-free (norm absorbs it)."""
    if ws:
        from ..layers import WSConv
        return WSConv(features, kernel_size=k, strides=stride,
                      dilation=dilation, use_bias=False, name=name)
    return nn.Conv(features, (k, k), strides=(stride, stride),
                   padding=[torch_pad(k)] * 2,
                   kernel_dilation=(dilation, dilation),
                   use_bias=False, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with identity/projection shortcut.

    ``dcn=True`` swaps the 3x3 for a (modulated) deformable conv — the
    reference's dcn stage plugin (resnet.py:134; configs/gfl/README.md:22
    r101-dcnv2 = 47.1 AP family).
    """
    planes: int  # mid channels; out = planes * 4
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dcn: bool = False
    dcn_modulated: bool = True
    # stage plugins (mmcv plugins=..., gcnet/empirical_attention configs)
    context_block: bool = False        # ContextBlock, position after_conv3
    context_block_ratio: float = 0.25
    gen_attention: bool = False        # GeneralizedAttention, after_conv2
    norm: str = 'frozen_bn'            # 'frozen_bn' | 'gn'
    conv_ws: bool = False              # weight-standardized convs (gn+ws)

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = _conv(self.conv_ws, self.planes, 1, dtype=x.dtype,
                  name='conv1')(x)
        y = _norm(self.norm, self.planes, 'bn1')(y)
        y = nn.relu(y)
        if self.dcn:
            from ...ops.deform_conv import ModulatedDeformConv
            y = ModulatedDeformConv(self.planes, kernel_size=3,
                                    strides=self.stride,
                                    dilation=self.dilation,
                                    modulated=self.dcn_modulated,
                                    name='conv2')(y)
        else:
            y = _conv(self.conv_ws, self.planes, 3, stride=self.stride,
                      dilation=self.dilation, dtype=y.dtype,
                      name='conv2')(y)
        y = _norm(self.norm, self.planes, 'bn2')(y)
        y = nn.relu(y)
        if self.gen_attention:
            from ..plugins import GeneralizedAttention
            y = GeneralizedAttention(name='gen_attention')(
                y.astype(jnp.float32)).astype(y.dtype)
        y = _conv(self.conv_ws, out_ch, 1, dtype=y.dtype, name='conv3')(y)
        y = _norm(self.norm, out_ch, 'bn3')(y)
        if self.context_block:
            from ..plugins import ContextBlock
            y = ContextBlock(ratio=self.context_block_ratio,
                             name='context_block')(
                y.astype(jnp.float32)).astype(y.dtype)
        if self.downsample:
            identity = _conv(self.conv_ws, out_ch, 1, stride=self.stride,
                             dtype=x.dtype, name='downsample_conv')(x)
            identity = _norm(self.norm, out_ch, 'downsample_bn')(identity)
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    norm: str = 'frozen_bn'
    conv_ws: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = _conv(self.conv_ws, self.planes, 3, stride=self.stride,
                  dtype=x.dtype, name='conv1')(x)
        y = _norm(self.norm, self.planes, 'bn1')(y)
        y = nn.relu(y)
        y = _conv(self.conv_ws, self.planes, 3, dtype=y.dtype,
                  name='conv2')(y)
        y = _norm(self.norm, self.planes, 'bn2')(y)
        if self.downsample:
            identity = _conv(self.conv_ws, self.planes, 1,
                             stride=self.stride, dtype=x.dtype,
                             name='downsample_conv')(x)
            identity = _norm(self.norm, self.planes,
                             'downsample_bn')(identity)
        return nn.relu(y + identity)


class StemConv(nn.Module):
    """7x7/2 stem conv with an MXU-friendly space-to-depth lowering.

    The plain 7x7 stride-2 conv on a 3-channel image uses 3 of the MXU's
    128 input lanes (~25 ms/fwd at bs=16 800x1344 in the round-4 trace).
    With ``s2d=True`` the SAME linear map is computed as a 4x4 stride-1
    conv on the 2x2-space-to-depth input (12 channels): pad the kernel to
    8x8 with a leading zero tap (offset -4), regroup (8,8,C) taps into
    (4,4,4C) by pixel parity, and shift the padding from (3,3) to (2,1).
    Tap-for-tap the products are identical; only the summation order
    changes (float-reassociation-level difference). The parameter keeps
    the torch-importable (7,7,C,F) layout either way.
    """
    features: int = 64
    s2d: bool = True
    ws: bool = False  # weight standardization (gn+ws), on the 7x7 kernel

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        if self.ws:
            mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
            std = kernel.std(axis=(0, 1, 2), keepdims=True)
            kernel = (kernel - mean) / (std + 1e-5)
        kernel = kernel.astype(x.dtype)
        dn = ('NHWC', 'HWIO', 'NHWC')
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        if not self.s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * cin)
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn)


class ResNet(nn.Module):
    """ResNet with detection-style multi-stage outputs.

    Attributes:
        depth: 18/34/50/101/152.
        out_indices: which stages to return (0-based; (0,1,2,3) -> C2..C5).
        strides/dilations: per-stage 3x3 stride/dilation.
    """
    depth: int = 50
    base_channels: int = 64
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    # per-stage deformable-conv plugin (reference dcn=dict(...),
    # stage_with_dcn=(False, True, True, True) in the dcnv2 configs)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    # ContextBlock plugin stages (configs/gcnet/*: (False, True, True,
    # True) with ratio 1/4 or 1/16, position after_conv3)
    context_block_stages: Tuple[bool, ...] = (False, False, False, False)
    context_block_ratio: float = 0.25
    # GeneralizedAttention '1111' stages (configs/empirical_attention/*:
    # (False, False, True, True), after_conv2)
    gen_attention_stages: Tuple[bool, ...] = (False, False, False, False)
    compute_dtype: jnp.dtype = jnp.float32
    # reference resnet.py _freeze_stages: requires_grad=False on the stem
    # (>=0) and layer1..layerN (>=N). Beyond the optimizer zero-update
    # mask (engine/optim.py), a stop_gradient at the frozen boundary lets
    # XLA dead-code-eliminate the ENTIRE backward pass through the frozen
    # stages — the same pruning torch autograd does when nothing below
    # requires grad.
    frozen_stages: int = -1
    # space-to-depth stem lowering (see StemConv): same linear map, MXU
    # lane utilization 12/128 instead of 3/128 on the stem conv.
    stem_s2d: bool = True
    # norm layer: 'frozen_bn' (reference norm_eval default) | 'gn'
    # (configs/gn, gn+ws); conv_ws pairs weight-standardized convs with GN
    # (configs/gn+ws conv_cfg=dict(type='ConvWS')).
    norm: str = 'frozen_bn'
    conv_ws: bool = False

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_type == 'bottleneck' else BasicBlock
        x = x.astype(self.compute_dtype)

        x = StemConv(self.base_channels, s2d=self.stem_s2d,
                     ws=self.conv_ws, name='stem_conv')(x)
        x = _norm(self.norm, self.base_channels, 'stem_bn')(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        for stage, num_blocks in enumerate(stage_blocks):
            stride = self.strides[stage]
            dilation = self.dilations[stage]
            for b in range(num_blocks):
                expansion = 4 if block_type == 'bottleneck' else 1
                needs_ds = b == 0 and (stride != 1 or
                                       x.shape[-1] != planes * expansion)
                kw = dict(norm=self.norm, conv_ws=self.conv_ws)
                if block_type == 'bottleneck':
                    if self.dcn_stages[stage]:
                        kw.update(dcn=True,
                                  dcn_modulated=self.dcn_modulated)
                    if self.context_block_stages[stage]:
                        kw.update(context_block=True,
                                  context_block_ratio=self.context_block_ratio)
                    if self.gen_attention_stages[stage]:
                        kw.update(gen_attention=True)
                x = block_cls(planes, stride=stride if b == 0 else 1,
                              downsample=needs_ds, dilation=dilation,
                              name=f'layer{stage + 1}_block{b}', **kw)(x)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
