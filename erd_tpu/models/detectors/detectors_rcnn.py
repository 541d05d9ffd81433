"""DetectoRS: Recursive Feature Pyramid + Switchable Atrous Convolution.

Behavioural mirror of /root/reference/mmdet/models/necks/rfp.py +
backbones/detectors_resnet.py + configs/detectors/* (the Faster R-CNN
variant; the paper's HTC flavor shares the same backbone/neck):

- step 1: SAC backbone -> FPN;
- feedback: each FPN level passes an ASPP block (4 parallel branches:
  1x1, two dilated 3x3s, global-pool 1x1 — rfp.py ASPP) and re-enters the
  backbone's stages through zero-init 1x1 convs (DetectoRSResNet
  rfp_feats);
- step 2: backbone (shared weights) + FPN again; final levels fuse as
  out = w * step2 + (1 - w) * step1 with a per-level sigmoid weight conv
  (rfp_weight, zero-init -> starts as the plain FPN).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.detectors_resnet import DetectoRSResNet
from ..heads.bbox_head import Shared2FCBBoxHead
from ..heads.rpn_head import RPNHeadNet
from ..layers import torch_pad
from ..necks.fpn import FPN
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


class ASPP(nn.Module):
    out_channels: int = 64

    @nn.compact
    def __call__(self, x):
        b1 = nn.Conv(self.out_channels, (1, 1), name='b0')(x)
        b2 = nn.Conv(self.out_channels, (3, 3), padding=[(3, 3)] * 2,
                     kernel_dilation=(3, 3), name='b1')(x)
        b3 = nn.Conv(self.out_channels, (3, 3), padding=[(6, 6)] * 2,
                     kernel_dilation=(6, 6), name='b2')(x)
        gp = nn.Conv(self.out_channels, (1, 1),
                     name='b3')(x.mean((1, 2), keepdims=True))
        gp = jnp.broadcast_to(gp, b1.shape)
        return nn.relu(jnp.concatenate([b1, b2, b3, gp], axis=-1))


class DetectoRSNet(FasterRCNNNet):
    rfp_steps: int = 2

    def setup(self):
        self.backbone = DetectoRSResNet(depth=self.depth,
                                        compute_dtype=self.compute_dtype)
        self.neck = FPN(in_channels=(256, 512, 1024, 2048),
                        out_channels=256, start_level=0,
                        add_extra_convs='', num_outs=5)
        self.aspp = [ASPP(name=f'aspp_{i}') for i in range(3)]
        self.rfp_weight = nn.Conv(1, (1, 1),
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name='rfp_weight')
        self.rpn_head = RPNHeadNet()
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes)

    def extract_feat(self, images):
        c = self.backbone(images)
        fpn1 = self.neck(c)
        # feedback: ASPP per used level -> stage inputs (strides 4/8/16)
        rfp = [None,
               self.aspp[0](fpn1[0].astype(jnp.float32)),
               self.aspp[1](fpn1[1].astype(jnp.float32)),
               self.aspp[2](fpn1[2].astype(jnp.float32))]
        c2 = self.backbone(images, rfp_feats=rfp)
        fpn2 = self.neck(c2)
        outs = []
        for f1, f2 in zip(fpn1, fpn2):
            w = jax.nn.sigmoid(self.rfp_weight(f2.astype(jnp.float32)))
            outs.append((w * f2.astype(jnp.float32) +
                         (1 - w) * f1.astype(jnp.float32))
                        .astype(f1.dtype))
        return tuple(outs)


@dataclass
class DetectoRSFasterRCNNDetector(FasterRCNNDetector):

    def __post_init__(self):
        super().__post_init__()
        self.net = DetectoRSNet(num_classes=self.num_classes,
                                depth=self.depth,
                                compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)
