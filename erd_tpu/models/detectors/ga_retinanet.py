"""GA-RetinaNet: Guided-Anchoring RetinaNet assembly.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/
ga_retina_head.py + configs/guided_anchoring/ga-retinanet_r50_fpn_1x_coco.py:
R50 + FPN (extra levels on_input, strides 8-128) + GARetinaHead. One square
scale-4 anchor per cell is *guided* by the predicted shape; losses are the
GA loc/shape pair plus focal/SmoothL1(0.04) against the guided anchors
(MaxIoU 0.5/0.5); inference masks locations below loc_filter_thr.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import ResNet
from ..heads.gfl_head import GFLTestConfig
from ..heads.guided_anchor_head import (GARetinaHeadNet, ga_retina_loss,
                                        ga_retina_predict)
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from .ga_faster_rcnn import GAPointContext

GA_RETINA_STRIDES = (8, 16, 32, 64, 128)


class GARetinaNetNet(nn.Module):
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
        return GARetinaHeadNet(num_classes=self.num_classes,
                               name='bbox_head')(feats)


@dataclass
class GARetinaNetDetector:
    num_classes: int = 80
    depth: int = 50
    loc_filter_thr: float = 0.01
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = GARetinaNetNet(num_classes=self.num_classes,
                                  depth=self.depth,
                                  compute_dtype=self.compute_dtype)
        self.coder = DeltaXYWHBBoxCoder()  # stds (1, 1, 1, 1)
        self._ctx_cache: Dict[Tuple[int, int], GAPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def point_context(self, image_shape) -> GAPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = GAPointContext.build(
                key, strides=GA_RETINA_STRIDES)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _flat(self, variables, images):
        locs, shapes, clss, regs = self.forward_raw(variables, images)
        b = images.shape[0]
        loc = jnp.concatenate([m.reshape(b, -1) for m in locs], axis=1)
        shp = jnp.concatenate([m.reshape(b, -1, 2) for m in shapes],
                              axis=1)
        cls = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in clss], axis=1)
        reg = jnp.concatenate([m.reshape(b, -1, 4) for m in regs], axis=1)
        return loc, shp, cls, reg

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        loc, shp, cls, reg = self._flat(variables, images)
        return ga_retina_loss(
            jnp.asarray(ctx.points), jnp.asarray(ctx.strides),
            ctx.num_level_points, loc, shp, cls, reg, batch['gt'],
            batch['meta'].img_shape, self.num_classes, self.coder,
            featmap_strides=GA_RETINA_STRIDES)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        loc, shp, cls, reg = self._flat(variables, images)
        return ga_retina_predict(
            jnp.asarray(ctx.points), jnp.asarray(ctx.strides),
            ctx.num_level_points, loc, shp, cls, reg, batch['meta'],
            self.coder, self.test_cfg, self.num_classes,
            loc_filter_thr=self.loc_filter_thr, rescale=rescale)
