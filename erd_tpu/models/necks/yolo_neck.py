"""YOLOv3 neck (top-down DetectionBlocks with concat fusion).

Mirrors /root/reference/mmdet/models/necks/yolo_neck.py: per scale a
5-conv DetectionBlock (1x1/3x3 alternating); coarser outputs are reduced
1x1, 2x-upsampled and concatenated into the next finer level.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import nearest_upsample_to
from ..backbones.darknet import ConvBN


class DetectionBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_channels
        x = ConvBN(c, 1, name='conv1')(x, train)
        x = ConvBN(c * 2, 3, name='conv2')(x, train)
        x = ConvBN(c, 1, name='conv3')(x, train)
        x = ConvBN(c * 2, 3, name='conv4')(x, train)
        return ConvBN(c, 1, name='conv5')(x, train)


class YOLOV3Neck(nn.Module):
    out_channels: Tuple[int, ...] = (512, 256, 128)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: (C3 256, C4 512, C5 1024), fine -> coarse
        c3, c4, c5 = feats
        out1 = DetectionBlock(self.out_channels[0], name='detect1')(c5,
                                                                    train)
        tmp = ConvBN(self.out_channels[1], 1, name='conv1')(out1, train)
        tmp = nearest_upsample_to(tmp, c4.shape[-3:-1])
        out2 = DetectionBlock(self.out_channels[1], name='detect2')(
            jnp.concatenate([tmp, c4], axis=-1), train)
        tmp = ConvBN(self.out_channels[2], 1, name='conv2')(out2, train)
        tmp = nearest_upsample_to(tmp, c3.shape[-3:-1])
        out3 = DetectionBlock(self.out_channels[2], name='detect3')(
            jnp.concatenate([tmp, c3], axis=-1), train)
        # coarse -> fine order (strides 32, 16, 8), matching mmdet
        return (out1, out2, out3)
