"""DETR detector assembly (R50 C5 -> transformer set prediction).

Mirrors /root/reference/mmdet/models/detectors/detr.py with
configs/detr/detr_r50_8xb2-150e_coco.py: single-level C5 features, 100
queries, Hungarian set losses with per-decoder-layer auxiliaries, NMS-free
top-k prediction. Uses AdamW-style recipes in practice (the trainer's SGD
also works; optimizer choice lives in configs)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ..backbones.resnet import ResNet
from ..heads.detr_head import (DETRHeadNet, DETRTrainConfig, detr_loss,
                               detr_predict)
from ..preprocessor import Preprocessor


class DETRNet(nn.Module):
    num_classes: int
    depth: int = 50
    num_queries: int = 100
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, valid_mask):
        feats = ResNet(depth=self.depth, out_indices=(3,),
                       compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        c5 = feats[0]
        # downsample the pixel-validity mask to the C5 grid
        h, w = c5.shape[1:3]
        mask = jax.image.resize(valid_mask.astype(jnp.float32),
                                (valid_mask.shape[0], h, w),
                                method='nearest') > 0.5
        return DETRHeadNet(num_classes=self.num_classes,
                           num_queries=self.num_queries,
                           name='bbox_head')(c5, mask)


@dataclass
class DETRDetector:
    num_classes: int = 80
    depth: int = 50
    num_queries: int = 100
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: DETRTrainConfig = field(default_factory=DETRTrainConfig)
    max_per_img: int = 100

    def __post_init__(self):
        self.net = DETRNet(num_classes=self.num_classes, depth=self.depth,
                           num_queries=self.num_queries,
                           compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _valid_mask(self, images, img_shapes):
        b, h, w = images.shape[:3]
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        return (ys < img_shapes[:, 0, None, None]) & \
               (xs < img_shapes[:, 1, None, None])

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        mask = jnp.ones((batch_size,) + tuple(image_shape), bool)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy), mask)

    def forward_raw(self, variables, images, img_shapes=None):
        if img_shapes is None:
            img_shapes = jnp.tile(
                jnp.asarray([images.shape[1], images.shape[2]],
                            jnp.float32), (images.shape[0], 1))
        mask = self._valid_mask(images, img_shapes)
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images), mask)

    def loss(self, variables, batch):
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images,
                                              batch['meta'].img_shape)
        return detr_loss(all_cls.astype(jnp.float32),
                         all_boxes.astype(jnp.float32), batch['gt'],
                         images.shape[1:3], self.num_classes,
                         self.train_cfg)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images,
                                              batch['meta'].img_shape)
        return detr_predict(all_cls[-1].astype(jnp.float32),
                            all_boxes[-1].astype(jnp.float32),
                            batch['meta'], images.shape[1:3],
                            self.num_classes, self.max_per_img,
                            rescale=rescale)
