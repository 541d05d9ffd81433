"""FPG: Feature Pyramid Grids neck.

Behavioural mirror of /root/reference/mmdet/models/necks/fpg.py with the
canonical configs/fpg/*_fpg_* setup: 1x1 laterals (+ stride-2 extra
downsamples to num_outs levels), then stack_times(=9) bottom-up
pathways. At stage s, level l fuses (by sum):
  - same_up: stride-2 conv of the NEW stage's level l-1 (act-conv-norm),
  - across_lateral: 1x1 conv of the previous stage's level l,
  - across_down: nearest-up x2 + 3x3 conv of previous stage's level l+1,
  - across_skip: 1x1 conv of the ORIGINAL laterals at level l;
levels listed in skip_inds[l] pass through unchanged at that stage (the
staircase warm-up of the paper). Output: per-level act-conv-norm 3x3
(last_conv on the final stack only). Documented deviation: GroupNorm
replaces BN inside transitions (repo-wide frozen-norm convention).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import nearest_upsample_to, torch_pad


class _ActConvNorm(nn.Module):
    channels: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        import math
        y = nn.relu(x)
        y = nn.Conv(self.channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[torch_pad(self.kernel)] * 2, name='conv')(y)
        return nn.GroupNorm(num_groups=math.gcd(32, self.channels),
                            name='gn')(y)


class FPG(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    inter_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    skip_inds: Tuple[Tuple[int, ...], ...] = (
        (0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())

    @nn.compact
    def __call__(self, inputs):
        c = self.inter_channels
        feats = [nn.Conv(c, (1, 1), name=f'lateral_{i}')(f)
                 for i, f in enumerate(inputs)]
        while len(feats) < self.num_outs:
            feats.append(nn.Conv(
                c, (3, 3), strides=(2, 2), padding=[torch_pad(3)] * 2,
                name=f'extra_down_{len(feats)}')(feats[-1]))
        origin = list(feats)
        cur = feats
        for s in range(self.stack_times):
            nxt = []
            for lvl in range(self.num_outs):
                if s in self.skip_inds[lvl]:
                    nxt.append(cur[lvl])
                    continue
                acc = _ActConvNorm(c, kernel=1,
                                   name=f's{s}_l{lvl}_lateral')(cur[lvl])
                if lvl > 0:
                    acc = acc + _ActConvNorm(
                        c, kernel=3, stride=2,
                        name=f's{s}_l{lvl}_same_up')(nxt[-1])
                if lvl < self.num_outs - 1:
                    up = nearest_upsample_to(cur[lvl + 1],
                                             cur[lvl].shape[1:3])
                    acc = acc + _ActConvNorm(
                        c, kernel=3,
                        name=f's{s}_l{lvl}_across_down')(up)
                acc = acc + _ActConvNorm(
                    c, kernel=1,
                    name=f's{s}_l{lvl}_across_skip')(origin[lvl])
                nxt.append(acc)
            cur = nxt
        return tuple(
            _ActConvNorm(self.out_channels, kernel=3,
                         name=f'out_{i}')(cur[i])
            for i in range(self.num_outs))
