"""YOLOF detector assembly (single-level "You Only Look One-level Feature").

Mirrors /root/reference/mmdet/models/detectors/yolof.py +
configs/yolof/yolof_r50-c5_8xb8-1x_coco.py: R50 C5 only -> DilatedEncoder
(512ch, dilations 2/4/6/8) -> YOLOFHead (5 anchors, implicit objectness,
UniformAssigner, GIoU), NMS iou 0.6. Deviation noted: the reference uses a
caffe-style R50; we use the standard pytorch-style ResNet and take its C5.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.yolof_head import (YOLOFHeadNet, YOLOFTrainConfig,
                                yolof_anchor_generator, yolof_coder,
                                yolof_loss, yolof_predict)
from ..layers import cast_compute_params
from ..necks.dilated_encoder import DilatedEncoder
from ..preprocessor import Preprocessor


class YOLOFNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        c5 = feats[-1]
        x = DilatedEncoder(name='neck')(c5, train)
        return YOLOFHeadNet(num_classes=self.num_classes,
                            name='bbox_head')(x, train)


@dataclass
class YOLOFDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: YOLOFTrainConfig = field(default_factory=YOLOFTrainConfig)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = YOLOFNet(num_classes=self.num_classes, depth=self.depth,
                            compute_dtype=self.compute_dtype)
        self.anchor_generator = yolof_anchor_generator()
        self.coder = yolof_coder()
        self._ctx_cache: Dict[Tuple[int, int], AnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def anchor_context(self, image_shape) -> AnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = AnchorContext.build(
                key, self.anchor_generator)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _flat(self, outs):
        cls_map, reg_map = outs
        b = cls_map.shape[0]
        return (cls_map.reshape(b, -1, self.num_classes).astype(jnp.float32),
                reg_map.reshape(b, -1, 4).astype(jnp.float32))

    def loss_and_state(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        outs, new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        cls_flat, reg_flat = self._flat(outs)
        losses = yolof_loss(ctx, cls_flat, reg_flat, batch['gt'],
                            self.num_classes, self.coder, self.train_cfg)
        return losses, new_state

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_flat, reg_flat = self._flat(self.forward_raw(variables, images))
        return yolof_predict(ctx, cls_flat, reg_flat, batch['meta'],
                             self.coder, self.test_cfg,
                             num_classes=self.num_classes, rescale=rescale)
