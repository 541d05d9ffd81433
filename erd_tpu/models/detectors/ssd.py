"""SSD300 detector assembly (mirrors mmdet's ssd300_coco config)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.ssd_vgg import SSDVGG
from ..heads.gfl_head import GFLTestConfig
from ..heads.ssd_head import (SSDAnchorContext, SSDHeadNet, ssd_loss,
                              ssd_predict, ssd_targets)
from ..preprocessor import Preprocessor


class SSDNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = SSDVGG(compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        return SSDHeadNet(num_classes=self.num_classes,
                          name='bbox_head')(feats)


@dataclass
class SSDDetector:
    num_classes: int = 80
    input_size: int = 300
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.02,
                                              iou_threshold=0.45,
                                              max_per_img=200))

    def __post_init__(self):
        self.net = SSDNet(num_classes=self.num_classes,
                          compute_dtype=self.compute_dtype)
        self.coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
        self._ctx_cache: Dict[Tuple[int, int], SSDAnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> SSDAnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = SSDAnchorContext.build(
                key, self.input_size)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=None, batch_size=1):
        shape = tuple(image_shape or (self.input_size, self.input_size))
        dummy = jnp.zeros((batch_size,) + shape + (3,), jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes + 1) for m in cls_lvl],
            axis=1)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = ssd_targets(ctx, batch['gt'], self.num_classes,
                              self.coder)
        return ssd_loss(cls_flat, reg_flat, targets, self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        return ssd_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                           self.coder, self.num_classes, self.test_cfg,
                           rescale=rescale)
