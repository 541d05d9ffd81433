"""DDOD detector assembly.

Mirrors /root/reference/mmdet/models/detectors/ddod.py +
configs/ddod/ddod_r50_fpn_1x_coco.py: R50 + FPN (extras ``on_output``) +
DDODHead (DCNv2 tower entries, IoU branch), disentangled dynamic-cost ATSS
(cls a=0.8 / reg a=0.5), NMS iou 0.6. Prediction reuses the ATSS path with
the IoU branch as the score factor (base_dense_head.py post-process).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.atss_head import atss_predict
from ..heads.ddod_head import DDODHeadNet, ddod_coder, ddod_loss
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from ...task import AnchorGenerator


class DDODNet(nn.Module):
    num_classes: int
    depth: int = 50
    use_dcn: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                    add_extra_convs='on_output', num_outs=5,
                    name='neck')(feats)
        return DDODHeadNet(num_classes=self.num_classes,
                           use_dcn=self.use_dcn, name='bbox_head')(feats)


@dataclass
class DDODDetector:
    num_classes: int = 80
    depth: int = 50
    use_dcn: bool = True
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = DDODNet(num_classes=self.num_classes, depth=self.depth,
                           use_dcn=self.use_dcn,
                           compute_dtype=self.compute_dtype)
        self.anchor_generator = AnchorGenerator(octave_base_scale=8)
        self.coder = ddod_coder()
        self._ctx_cache: Dict[Tuple[int, int], AnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
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

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl, iou_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        iou_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in iou_lvl], axis=1).astype(jnp.float32)
        return ddod_loss(ctx, cls_flat, reg_flat, iou_flat, batch['gt'],
                         self.coder, self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl, iou_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        reg_lvl = [r.astype(jnp.float32) for r in reg_lvl]
        iou_lvl = [s.astype(jnp.float32) for s in iou_lvl]
        return atss_predict(ctx, cls_lvl, reg_lvl, iou_lvl, batch['meta'],
                            self.coder, self.test_cfg,
                            num_classes=self.num_classes, rescale=rescale)
