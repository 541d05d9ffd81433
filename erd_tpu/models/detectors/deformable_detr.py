"""Deformable DETR detector assembly.

Mirrors the reference's deformable-detr_r50_16xb2-50e config shape: R50
C3-C5 + one extra stride-2 level through a GN ChannelMapper, deformable
encoder/decoder, 300 queries (configurable), sigmoid-focal classification,
NMS-free top-k prediction.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ..backbones.resnet import ResNet
from ..heads.deformable_detr_head import (DeformableDETRHeadNet,
                                          DeformableDETRTrainConfig,
                                          deformable_detr_loss)
from ..heads.detr_head import cxcywh_to_xyxy
from ..necks.extra_necks import ChannelMapper
from ..preprocessor import Preprocessor
from ...structures import DetResults
from ...structures.boxes import scale_boxes


class DeformableDETRNet(nn.Module):
    num_classes: int
    depth: int = 50
    num_queries: int = 100
    embed_dim: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                       compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = ChannelMapper(in_channels=in_ch,
                              out_channels=self.embed_dim,
                              kernel_size=1, num_outs=4,
                              name='neck')(feats)
        feats = [f.astype(jnp.float32) for f in feats]
        return DeformableDETRHeadNet(num_classes=self.num_classes,
                                     embed_dim=self.embed_dim,
                                     num_queries=self.num_queries,
                                     name='bbox_head')(feats)


@dataclass
class DeformableDETRDetector:
    num_classes: int = 80
    depth: int = 50
    num_queries: int = 100
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: DeformableDETRTrainConfig = field(
        default_factory=DeformableDETRTrainConfig)
    max_per_img: int = 100

    def __post_init__(self):
        self.net = DeformableDETRNet(num_classes=self.num_classes,
                                     depth=self.depth,
                                     num_queries=self.num_queries,
                                     compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images)
        return deformable_detr_loss(all_cls.astype(jnp.float32),
                                    all_boxes.astype(jnp.float32),
                                    batch['gt'], images.shape[1:3],
                                    self.num_classes, self.train_cfg)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images)
        cls = all_cls[-1].astype(jnp.float32)
        boxes = all_boxes[-1].astype(jnp.float32)
        ch, cw = images.shape[1:3]

        def single(cl, bx, img_shape, scale_factor):
            prob = jax.nn.sigmoid(cl)  # (Q, C)
            flat = prob.reshape(-1)
            k = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            qidx = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
            b_xyxy = cxcywh_to_xyxy(bx[qidx]) * norm
            h, w = img_shape[0], img_shape[1]
            b_xyxy = jnp.clip(b_xyxy, 0,
                              jnp.stack([w, h, w, h]).astype(b_xyxy.dtype))
            if rescale:
                b_xyxy = scale_boxes(b_xyxy, 1.0 / scale_factor)
            return DetResults(bboxes=b_xyxy, scores=top, labels=labels,
                              mask=top > 0)

        return jax.vmap(single)(cls, boxes, batch['meta'].img_shape,
                                batch['meta'].scale_factor)
