"""SSD-VGG16 backbone (300 input), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/ssd_vgg.py:
VGG-16 convs through conv5_3, 3x3/s1 pool5, dilated fc6 (3x3, d=6, 1024),
fc7 (1x1, 1024), then the SSD extra stack (conv8..conv11); feature outputs
at conv4_3 (L2Norm with learnable scale, init 20) and fc7 plus every second
extra conv. No BN (classic Caffe SSD).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import max_pool_torch, torch_pad

VGG16_CFG = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class L2Norm(nn.Module):
    channels: int
    scale_init: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            'scale', lambda key: jnp.full((self.channels,),
                                          self.scale_init, jnp.float32))
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) +
                        self.eps)
        return x / norm * scale.astype(x.dtype)


#: SSD extra-stack recipes keyed by input size
#: (mid, out, stride, pad, kernel) per pair — mirrors the SSDNeck configs
#: (reference configs/ssd/ssd300_coco.py neck out_channels/strides/paddings
#: and ssd512_coco.py: one more s2 pair + a final 4x4/s1/p1 conv,
#: mid = out_channel // 2 per mmdet/models/necks/ssd_neck.py:75-89).
EXTRA_CFG = {
    300: ((256, 512, 2, 1, 3), (128, 256, 2, 1, 3),
          (128, 256, 1, 0, 3), (128, 256, 1, 0, 3)),
    512: ((256, 512, 2, 1, 3), (128, 256, 2, 1, 3),
          (128, 256, 2, 1, 3), (128, 256, 2, 1, 3),
          (128, 256, 1, 1, 4)),
}


class SSDVGG(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32
    input_size: int = 300

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        outs = []
        for stage, (n, ch) in enumerate(VGG16_CFG, start=1):
            for i in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=[torch_pad(3)] * 2,
                                    name=f'conv{stage}_{i + 1}')(x))
                if stage == 4 and i == n - 1:
                    outs.append(L2Norm(512, name='l2_norm')(x))  # conv4_3
            if stage < 5:
                # ceil_mode pooling (torch MaxPool2d(2, 2, ceil_mode=True))
                ph = x.shape[1] % 2
                pw = x.shape[2] % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                constant_values=-jnp.inf)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = max_pool_torch(x, 3, 1, 1)  # pool5: 3x3 stride 1
        # dilated fc6 + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), name='fc6')(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name='fc7')(x))
        outs.append(x)
        # extras: (1x1 reduce, kxk) pairs; 300: 10x10 -> 5 -> 3 -> 1,
        # 512: 32 -> 16 -> 8 -> 4 -> 2 -> 1 (last pair 4x4/s1/p1)
        for i, (mid, out, s, p, k) in enumerate(EXTRA_CFG[self.input_size],
                                                start=8):
            x = nn.relu(nn.Conv(mid, (1, 1), name=f'conv{i}_1')(x))
            x = nn.relu(nn.Conv(out, (k, k), strides=(s, s),
                                padding=[(p, p), (p, p)],
                                name=f'conv{i}_2')(x))
            outs.append(x)
        return tuple(outs)
