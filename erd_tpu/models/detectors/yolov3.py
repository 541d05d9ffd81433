"""YOLOv3 detector assembly (Darknet-53 + YOLOV3Neck + YOLOV3Head).

Mirrors /root/reference/mmdet/models/detectors/yolo.py +
configs/yolo/yolov3_d53_*; first detector using train-time BatchNorm, so the
train path goes through ``loss_and_state`` (updated 'batch_stats' returned
alongside losses; the Trainer threads them).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ..backbones.darknet import Darknet
from ..heads.gfl_head import GFLTestConfig
from ..heads.yolo_head import (YOLOContext, YOLOV3HeadNet, _flatten_pred,
                               yolo_loss, yolo_predict, yolo_targets)
from ..necks.yolo_neck import YOLOV3Neck
from ..preprocessor import Preprocessor


class YOLOV3Net(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = Darknet(compute_dtype=self.compute_dtype,
                        name='backbone')(images, train)
        feats = YOLOV3Neck(name='neck')(feats, train)
        return YOLOV3HeadNet(num_classes=self.num_classes,
                             name='bbox_head')(feats, train)


@dataclass
class YOLOV3Detector:
    num_classes: int = 80
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.05,
                                              iou_threshold=0.45))

    def __post_init__(self):
        self.net = YOLOV3Net(num_classes=self.num_classes,
                             compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], YOLOContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> YOLOContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = YOLOContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss_and_state(self, variables, batch, teacher_variables=None):
        """Train forward with BatchNorm stat updates; returns (losses,
        updated consts)."""
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        preds_lvl, new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        preds = _flatten_pred(preds_lvl, self.num_classes)
        targets = yolo_targets(ctx, batch['gt'])
        losses = yolo_loss(ctx, preds, targets, self.num_classes)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        losses, _ = self.loss_and_state(variables, batch)
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        preds_lvl = self.forward_raw(variables, images)
        preds = _flatten_pred(preds_lvl, self.num_classes)
        return yolo_predict(ctx, preds, batch['meta'], self.num_classes,
                            self.test_cfg, rescale=rescale)
