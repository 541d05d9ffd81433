"""TridentResNet backbone (weight-shared multi-dilation branches).

Behavioural mirror of
/root/reference/mmdet/models/backbones/trident_resnet.py: a ResNet-C4
trunk whose LAST stage (res4) is replaced by trident blocks — each block's
3x3 conv runs ``num_branch``(=3) parallel branches with dilations
(1, 2, 3) sharing ONE weight tensor (TridentConv); branch outputs stay
parallel (stacked into the batch axis) through the rest of the stage.
Frozen BN, pytorch-style stem, C4 output at stride 16 per branch.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm, max_pool_torch, torch_pad

ARCH = {50: (3, 4, 6), 101: (3, 4, 23)}  # stages 1-3 (C2..C4)


class TridentConv(nn.Module):
    """One 3x3 weight shared across ``dilations`` branches."""
    features: int
    dilations: Tuple[int, ...] = (1, 2, 3)
    stride: int = 1

    @nn.compact
    def __call__(self, xs):
        """xs: list of per-branch (B, H, W, C)."""
        weight = self.param('kernel', nn.initializers.he_normal(),
                            (3, 3, xs[0].shape[-1], self.features),
                            jnp.float32)
        outs = []
        for x, d in zip(xs, self.dilations):
            # conv runs in the activation dtype (cast_compute_params may
            # hand the kernel in bf16) with f32 accumulation
            y = jax.lax.conv_general_dilated(
                x, weight.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            outs.append(y.astype(x.dtype))
        return outs


class TridentBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilations: Tuple[int, ...] = (1, 2, 3)

    @nn.compact
    def __call__(self, xs):
        out_ch = self.planes * 4
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')
        bn1 = FrozenBatchNorm(self.planes, name='bn1')
        tconv = TridentConv(self.planes, self.dilations,
                            stride=self.stride, name='conv2')
        bn2 = FrozenBatchNorm(self.planes, name='bn2')
        conv3 = nn.Conv(out_ch, (1, 1), use_bias=False, name='conv3')
        bn3 = FrozenBatchNorm(out_ch, name='bn3')
        ys = [nn.relu(bn1(conv1(x))) for x in xs]
        ys = tconv(ys)
        ys = [nn.relu(bn2(y)) for y in ys]
        ys = [bn3(conv3(y)) for y in ys]
        if self.downsample:
            ds_conv = nn.Conv(out_ch, (1, 1),
                              strides=(self.stride, self.stride),
                              use_bias=False, name='downsample_conv')
            ds_bn = FrozenBatchNorm(out_ch, name='downsample_bn')
            ids = [ds_bn(ds_conv(x)) for x in xs]
        else:
            ids = xs
        return [nn.relu(y + i) for y, i in zip(ys, ids)]


class TridentResNet(nn.Module):
    depth: int = 50
    num_branch: int = 3
    dilations: Tuple[int, ...] = (1, 2, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .resnet import Bottleneck
        stage_blocks = ARCH[self.depth]
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[torch_pad(7)] * 2, use_bias=False,
                    name='stem_conv')(x)
        x = nn.relu(FrozenBatchNorm(64, name='stem_bn')(x))
        x = max_pool_torch(x, 3, 2, 1)
        planes = 64
        for stage in range(2):  # res2, res3 (single-branch)
            stride = 1 if stage == 0 else 2
            for b in range(stage_blocks[stage]):
                needs = b == 0 and (stride != 1 or
                                    x.shape[-1] != planes * 4)
                x = Bottleneck(planes, stride=stride if b == 0 else 1,
                               downsample=needs,
                               name=f'layer{stage + 1}_block{b}')(x)
            planes *= 2
        # trident stage (res4): 3 weight-shared dilated branches
        xs = [x] * self.num_branch
        stride = 2
        for b in range(stage_blocks[2]):
            needs = b == 0
            xs = TridentBottleneck(planes,
                                   stride=stride if b == 0 else 1,
                                   downsample=needs,
                                   dilations=self.dilations,
                                   name=f'layer3_block{b}')(xs)
        # stack branches into the batch axis: (num_branch*B, H, W, C)
        return jnp.concatenate(xs, axis=0)
