"""PAA detector assembly (probabilistic anchor assignment).

Mirrors /root/reference/mmdet/models/detectors/paa.py +
configs/paa/paa_r50_fpn_1x_coco.py: the ATSS architecture (R50 + FPN +
cls/reg/IoU-pred towers, one anchor per cell) trained with the GMM-based
PAA assignment; the IoU branch multiplies scores at test time.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..heads.atss_head import atss_predict
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.paa_head import paa_loss
from ..layers import cast_compute_params
from ..preprocessor import Preprocessor
from ...task.anchors import AnchorGenerator
from ...task.coder import DeltaXYWHBBoxCoder
from .atss import ATSSNet


@dataclass
class PAADetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    topk: int = 9
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    anchor_generator: AnchorGenerator = field(
        default_factory=AnchorGenerator)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = ATSSNet(num_classes=self.num_classes, depth=self.depth,
                           compute_dtype=self.compute_dtype)
        self.coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
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
            [m.reshape(b, -1) for m in iou_lvl],
            axis=1).astype(jnp.float32)
        return paa_loss(ctx, cls_flat, reg_flat, iou_flat, batch['gt'],
                        self.coder, self.num_classes, topk=self.topk)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl, iou_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        iou_lvl = [c.astype(jnp.float32) for c in iou_lvl]
        return atss_predict(ctx, cls_lvl, reg_lvl, iou_lvl, batch['meta'],
                            self.coder, self.test_cfg,
                            num_classes=self.num_classes, rescale=rescale)
