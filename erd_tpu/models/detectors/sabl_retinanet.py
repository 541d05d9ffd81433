"""SABL-RetinaNet detector assembly.

Mirrors /root/reference/configs/sabl/sabl-retinanet_r50_fpn_1x_coco.py:
R50 + FPN (extras ``on_input``) + SABLRetinaHead (single square prior,
bucketing side-aware localization). See
erd_tpu/models/heads/sabl_retina_head.py for the protocol citations.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ..backbones.resnet import ResNet
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.sabl_retina_head import (SABLRetinaHeadNet, SABLTrainConfig,
                                      sabl_approx_generator, sabl_loss,
                                      sabl_predict, sabl_square_generator,
                                      sabl_targets)
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from ...task.bucketing import BucketingBBoxCoder


class SABLRetinaNetNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    num_buckets: int = 14
    use_gn: bool = False

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                    add_extra_convs='on_input', num_outs=5,
                    name='neck')(feats)
        return SABLRetinaHeadNet(num_classes=self.num_classes,
                                 num_buckets=self.num_buckets,
                                 use_gn=self.use_gn,
                                 name='bbox_head')(feats)


@dataclass
class SABLRetinaNetDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    num_buckets: int = 14
    scale_factor: float = 3.0
    use_gn: bool = False
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: SABLTrainConfig = field(default_factory=SABLTrainConfig)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = SABLRetinaNetNet(num_classes=self.num_classes,
                                    depth=self.depth,
                                    compute_dtype=self.compute_dtype,
                                    num_buckets=self.num_buckets,
                                    use_gn=self.use_gn)
        self.square_generator = sabl_square_generator()
        self.approx_generator = sabl_approx_generator()
        self.coder = BucketingBBoxCoder(num_buckets=self.num_buckets,
                                        scale_factor=self.scale_factor)
        self._ctx_cache: Dict[Tuple[int, int],
                              Tuple[AnchorContext, AnchorContext]] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def anchor_context(self, image_shape):
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = (
                AnchorContext.build(key, self.square_generator),
                AnchorContext.build(key, self.approx_generator))
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
        square_ctx, approx_ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, bcls_lvl, breg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        side = (self.num_buckets + 1) // 2
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        bcls_flat = jnp.concatenate(
            [m.reshape(b, -1, 4 * side) for m in bcls_lvl], axis=1)
        breg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4 * side) for m in breg_lvl], axis=1)
        targets = sabl_targets(square_ctx.anchors, approx_ctx.anchors,
                               batch['gt'], self.num_classes, self.coder,
                               self.train_cfg)
        return sabl_loss(cls_flat, bcls_flat, breg_flat, targets,
                         self.coder, self.train_cfg)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        square_ctx, _ = self.anchor_context(images.shape[1:3])
        cls_lvl, bcls_lvl, breg_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        return sabl_predict(square_ctx, cls_lvl, bcls_lvl, breg_lvl,
                            batch['meta'], self.coder, self.test_cfg,
                            num_classes=self.num_classes, rescale=rescale)
