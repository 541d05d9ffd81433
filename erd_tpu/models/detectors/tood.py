"""TOOD detector assembly.

Mirrors /root/reference/mmdet/models/detectors/tood.py +
configs/tood/tood_r50_fpn_1x_coco.py: R50 + FPN (on_output extras) +
T-head with TAL; ``set_epoch``-driven switch from the initial ATSS+focal
phase (epoch < 4) to task-aligned learning is realized as the static
``initial`` flag on the loss (two jit variants).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.gfl_head import GFLTestConfig
from ..heads.tood_head import (TOODContext, TOODHeadNet, tood_loss,
                               tood_predict)
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class TOODNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    # dconv c3-c5 recipes (reference configs/tood/
    # tood_r101-dconv-c3-c5_fpn_ms-2x_coco.py: backbone DCNv2 stages)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       dcn_stages=self.dcn_stages,
                       dcn_modulated=self.dcn_modulated,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                    add_extra_convs='on_output', num_outs=5,
                    name='neck')(feats)
        return TOODHeadNet(num_classes=self.num_classes,
                           name='bbox_head')(feats)


@dataclass
class TOODDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    initial_epochs: int = 4  # train_cfg.initial_epoch
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = TOODNet(num_classes=self.num_classes, depth=self.depth,
                           compute_dtype=self.compute_dtype,
                           dcn_stages=tuple(self.dcn_stages),
                           dcn_modulated=self.dcn_modulated)
        self._ctx_cache: Dict[Tuple[int, int], TOODContext] = {}
        self.loss_jit = jax.jit(partial(self.loss, initial=False))
        self.loss_initial_jit = jax.jit(partial(self.loss, initial=True))
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> TOODContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = TOODContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _flatten(self, cls_lvl, box_lvl):
        b = cls_lvl[0].shape[0]
        cls = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl], axis=1)
        boxes = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in box_lvl], axis=1)
        return cls.astype(jnp.float32), boxes.astype(jnp.float32)

    def loss(self, variables, batch, initial=False):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, box_lvl = self.forward_raw(variables, images)
        cls, boxes = self._flatten(cls_lvl, box_lvl)
        return tood_loss(ctx, cls, boxes, batch['gt'], self.num_classes,
                         initial=initial)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, box_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        box_lvl = [v.astype(jnp.float32) for v in box_lvl]
        return tood_predict(ctx, cls_lvl, box_lvl, batch['meta'],
                            self.test_cfg, self.num_classes,
                            rescale=rescale)
