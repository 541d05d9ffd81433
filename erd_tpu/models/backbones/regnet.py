"""RegNet backbone, flax.linen NHWC (frozen-BN detection form).

Behavioural mirror of /root/reference/mmdet/models/backbones/regnet.py:
stage widths/depths generated from (w0, wa, wm, depth) via the RegNet
quantized-linear rule (generate_regnet / adjust_width_group), grouped
1x1-3x3-1x1 bottlenecks with bottleneck_ratio 1 (so mid width == out
width), 32-ch 3x3/s2 stem. Named arches match the reference's
``arch_settings`` (regnetx_400mf ... regnetx_12gf).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import FrozenBatchNorm, torch_pad

ARCH_PARAMS = {
    'regnetx_400mf': dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    'regnetx_800mf': dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    'regnetx_1.6gf': dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    'regnetx_3.2gf': dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    'regnetx_4.0gf': dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    'regnetx_6.4gf': dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    'regnetx_8.0gf': dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    'regnetx_12gf': dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def generate_regnet(w0, wa, wm, depth, divisor=8):
    """Per-block widths by the quantized linear rule (reference :160-199)."""
    ws_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / divisor) * divisor
    num_stages = len(np.unique(ws))
    return ws.astype(int).tolist(), int(num_stages)


def adjust_width_group(widths, groups):
    """Snap widths to multiples of their group width (reference :228-253)."""
    out_w, out_g = [], []
    for w, g in zip(widths, groups):
        g = min(g, w)
        w = int(round(w / g) * g)
        out_w.append(w)
        out_g.append(g)
    return out_w, out_g


def regnet_stages(arch: str):
    p = ARCH_PARAMS[arch]
    ws, num_stages = generate_regnet(p['w0'], p['wa'], p['wm'], p['depth'])
    stage_widths = []
    stage_depths = []
    for w in ws:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(w)
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    groups = [p['group_w']] * len(stage_widths)
    stage_widths, groups = adjust_width_group(stage_widths, groups)
    return stage_widths, stage_depths, groups


class RegBottleneck(nn.Module):
    width: int
    group_width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=x.dtype,
                    name='conv1')(x)
        y = nn.relu(FrozenBatchNorm(self.width, name='bn1')(y))
        groups = max(1, self.width // self.group_width)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=[torch_pad(3)] * 2,
                    feature_group_count=groups, use_bias=False,
                    dtype=y.dtype, name='conv2')(y)
        y = nn.relu(FrozenBatchNorm(self.width, name='bn2')(y))
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=y.dtype,
                    name='conv3')(y)
        y = FrozenBatchNorm(self.width, name='bn3')(y)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=x.dtype,
                               name='downsample_conv')(x)
            identity = FrozenBatchNorm(self.width,
                                       name='downsample_bn')(identity)
        return nn.relu(y + identity)


class RegNet(nn.Module):
    arch: str = 'regnetx_3.2gf'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        widths, depths, groups = regnet_stages(self.arch)
        x = x.astype(self.compute_dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[torch_pad(3)] * 2,
                    use_bias=False, dtype=x.dtype, name='stem_conv')(x)
        x = nn.relu(FrozenBatchNorm(32, name='stem_bn')(x))
        outs = []
        for stage in range(len(widths)):
            for b in range(depths[stage]):
                needs_ds = b == 0 and (self.strides[stage] != 1 or
                                       x.shape[-1] != widths[stage])
                x = RegBottleneck(
                    widths[stage], groups[stage],
                    stride=self.strides[stage] if b == 0 else 1,
                    downsample=needs_ds,
                    name=f'layer{stage + 1}_block{b}')(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
