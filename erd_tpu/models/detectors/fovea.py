"""FoveaBox detector assembly.

Mirrors /root/reference/mmdet/models/detectors/fovea.py +
configs/foveabox/fovea_r50_fpn_4xb4-1x_coco.py: R50 + FPN (extras
``on_input``) + FoveaHead (sigma=0.4, no deform), FocalLoss(1.5/0.4) +
SmoothL1(0.11), NMS iou 0.5.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.fcos_head import FCOSPointContext
from ..heads.fovea_head import (FoveaHeadNet, fovea_loss, fovea_predict,
                                fovea_targets)
from ..heads.gfl_head import GFLTestConfig
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class FoveaNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                    add_extra_convs='on_input', num_outs=5,
                    name='neck')(feats)
        return FoveaHeadNet(num_classes=self.num_classes,
                            name='bbox_head')(feats)


@dataclass
class FoveaDetector:
    num_classes: int = 80
    depth: int = 50
    sigma: float = 0.4
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = FoveaNet(num_classes=self.num_classes, depth=self.depth,
                            compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], FCOSPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def point_context(self, image_shape) -> FCOSPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = FCOSPointContext.build(key)
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
        ctx = self.point_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = fovea_targets(ctx, batch['gt'], self.num_classes,
                                sigma=self.sigma)
        return fovea_loss(cls_flat, reg_flat, targets, self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        reg_lvl = [r.astype(jnp.float32) for r in reg_lvl]
        return fovea_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                             self.test_cfg, num_classes=self.num_classes,
                             rescale=rescale)
