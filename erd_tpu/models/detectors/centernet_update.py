"""CenterNet-update detector (CenterNet2's single-stage CenterNet on FPN).

Assembly mirror of
configs/centernet/centernet-update_r50-caffe_fpn_ms-1x_coco.py: R50 + FPN
(P3-P7, extras on_output, relu_before_extra_convs) + CenterNetUpdateHead
(heads/centernet_update_head.py for the protocol and its reference
citations).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ..backbones.resnet import ResNet
from ..heads.centernet_update_head import (CenterNetUpdateHeadNet,
                                           CNUPointContext, cnu_loss,
                                           cnu_predict)
from ..heads.gfl_head import GFLTestConfig
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class CenterNetUpdateNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                    add_extra_convs='on_output', num_outs=5,
                    relu_before_extra_convs=True, name='neck')(feats)
        return CenterNetUpdateHeadNet(num_classes=self.num_classes,
                                      name='bbox_head')(feats)


@dataclass
class CenterNetUpdateDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    pos_weight: float = 0.25
    neg_weight: float = 0.75
    bbox_weight: float = 2.0
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = CenterNetUpdateNet(num_classes=self.num_classes,
                                      depth=self.depth,
                                      compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], CNUPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> CNUPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = CNUPointContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        return cnu_loss(ctx, cls_flat, reg_flat, batch['gt'],
                        self.num_classes, pos_weight=self.pos_weight,
                        neg_weight=self.neg_weight,
                        bbox_weight=self.bbox_weight)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        reg_lvl = [r.astype(jnp.float32) for r in reg_lvl]
        return cnu_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                           self.test_cfg, self.num_classes,
                           rescale=rescale)
