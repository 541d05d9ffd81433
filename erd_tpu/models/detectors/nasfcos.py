"""NAS-FCOS: searched FPN + searched head on the FCOS pipeline.

Behavioural mirror of /root/reference/mmdet/models/detectors/nasfcos.py +
necks/nasfcos_fpn.py + dense_heads/nasfcos_head.py + configs/nasfcos/*:
the searched neck composes ConcatCells over the adapted C3-C5 features in
the fixed discovered topology (c22_1, c22_2, c32, c02, c42, c36, c61 —
indices into the growing feature list, :102-108), sums the selected
outputs with the f5 global feature and resizes back to P3-P5 (+2 extra
downsamples); the searched head replaces FCOS's plain towers with the
discovered (dconv3x3-gn, conv1x1-gn, dconv3x3-gn, conv1x1-gn) sequence —
dconv realized with the gather-based DCN. Losses/targets/decode are
exactly FCOS's (nasfcos_head inherits them).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import ModulatedDeformConv
from ..backbones.resnet import ResNet
from ..heads.fcos_head import FCOSHeadNet
from ..layers import Scale, bias_init_prob, torch_pad
from .fcos import FCOSDetector


class ConcatCell(nn.Module):
    """mmcv ConcatCell: per-input 1x1 grouped convs, resize to the larger
    input, concat + (norm-act-conv) out conv."""
    channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        def in_conv(x, name, enabled):
            if not enabled:
                return x
            return nn.Conv(self.channels, (3, 3),
                           padding=[torch_pad(3)] * 2, use_bias=False,
                           name=name)(x)

        x1 = in_conv(x1, 'input1_conv', self.with_input1_conv)
        x2 = in_conv(x2, 'input2_conv', self.with_input2_conv)
        hw = (max(x1.shape[1], x2.shape[1]), max(x1.shape[2], x2.shape[2]))

        def to(x):
            if x.shape[1:3] == hw:
                return x
            return jax.image.resize(
                x, x.shape[:1] + hw + x.shape[-1:], method='bilinear')

        y = jnp.concatenate([to(x1), to(x2)], axis=-1)
        y = nn.GroupNorm(num_groups=1, name='out_norm')(y)
        y = nn.relu(y)
        return nn.Conv(self.channels, (1, 1), use_bias=False,
                       feature_group_count=1, name='out_conv')(y)


class NASFCOSFPN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, inputs):
        """inputs C2..C5; uses C3..C5 (start_level 1)."""
        c = self.out_channels
        feats = [nn.Conv(c, (1, 1), name=f'adapt_{i}')(inputs[i + 1])
                 for i in range(3)]
        topology = ['c22_1', 'c22_2', 'c32', 'c02', 'c42', 'c36', 'c61']
        flags = {'c22_1': (True, True), 'c22_2': (True, True),
                 'c32': (True, False), 'c02': (True, False),
                 'c42': (True, True), 'c36': (True, True),
                 'c61': (True, True)}
        for name in topology:
            i1, i2 = int(name[1]), int(name[2])
            f1, f2 = flags[name]
            feats.append(ConcatCell(c, f1, f2, name=name)(
                feats[i1], feats[i2]))
        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1 = feats[idx]
            f2 = jax.image.resize(
                feats[5], feats[5].shape[:1] + f1.shape[1:3] +
                feats[5].shape[-1:], method='bilinear')
            summed = f1 + f2
            tgt = inputs[input_idx].shape[1:3]
            ret.append(jax.image.resize(
                summed, summed.shape[:1] + tgt + summed.shape[-1:],
                method='bilinear'))
        for k in range(2):
            ret.append(nn.max_pool(
                nn.Conv(c, (3, 3), strides=(2, 2),
                        padding=[torch_pad(3)] * 2,
                        name=f'extra_{k}')(ret[-1]), (1, 1)))
        return tuple(ret)


class NASFCOSHeadNet(FCOSHeadNet):
    """FCOS head whose towers follow the searched op sequence
    (dconv3x3 -> conv1x1 -> dconv3x3 -> conv1x1, all GN'd)."""

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        def tower(prefix):
            mods = []
            for i in range(4):
                if i % 2 == 0:
                    mods.append(('dcn', ModulatedDeformConv(
                        self.feat_channels, kernel_size=3,
                        name=f'{prefix}_dcn_{i}'),
                        nn.GroupNorm(num_groups=32,
                                     name=f'{prefix}_gn_{i}')))
                else:
                    mods.append(('conv', nn.Conv(
                        self.feat_channels, (1, 1), use_bias=False,
                        name=f'{prefix}_conv_{i}'),
                        nn.GroupNorm(num_groups=32,
                                     name=f'{prefix}_gn_{i}')))
            return mods

        cls_tower = tower('cls')
        reg_tower = tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_ctr = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_centerness')
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]

        def run(tower_mods, x):
            for _, conv, gn in tower_mods:
                x = nn.relu(gn(conv(x)))
            return x

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cf = run(cls_tower, x)
            rf = run(reg_tower, x)
            cls_out.append(conv_cls(cf))
            ctr_out.append(conv_ctr(cf))
            reg_out.append(
                jnp.exp(scales[lvl](conv_reg(rf)).astype(jnp.float32)))
        return cls_out, reg_out, ctr_out


class NASFCOSNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        feats = NASFCOSFPN(name='neck')(feats)
        return NASFCOSHeadNet(num_classes=self.num_classes,
                              name='bbox_head')(feats)


@dataclass
class NASFCOSDetector(FCOSDetector):

    def __post_init__(self):
        super().__post_init__()
        self.net = NASFCOSNet(num_classes=self.num_classes,
                              depth=self.depth,
                              compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)
