"""RetinaNet detector assembly.

Mirrors /root/reference/mmdet/models/detectors/retinanet.py +
configs/retinanet/retinanet_r50_fpn_1x_coco.py: R50 + FPN (extra levels
``on_input``) + RetinaHead, FocalLoss/L1, MaxIoU assignment, NMS iou 0.5.
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
from ..heads.retina_head import (RetinaHeadNet, RetinaSepBNHeadNet,
                                 RetinaTrainConfig,
                                 retina_anchor_generator, retina_loss,
                                 retina_predict, retina_targets)
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from ...task.coder import DeltaXYWHBBoxCoder


class RetinaNetNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    # swaps (configs/efficientnet, configs/nas_fpn): static backbone and
    # neck spec tuples, mirroring GFLNet's swap fields
    backbone_spec: Any = None
    neck_spec: Any = None
    # RetinaSepBNHead (configs/nas_fpn): shared convs, per-level BN
    sepbn: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        if self.backbone_spec is not None:
            from ..backbones import (STATEFUL_BACKBONES,
                                     build_swappable_backbone)
            bb = build_swappable_backbone(
                dict(self.backbone_spec), self.compute_dtype,
                name='backbone')
            spec_type = dict(self.backbone_spec).get('type')
            feats = bb(images, train=train) \
                if spec_type in STATEFUL_BACKBONES else bb(images)
        else:
            feats = ResNet(depth=self.depth,
                           compute_dtype=self.compute_dtype,
                           name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        if self.neck_spec is not None:
            from ..necks import NeckChain
            feats = NeckChain(spec=self.neck_spec, name='neck')(feats)
        else:
            feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                        add_extra_convs='on_input', num_outs=5,
                        name='neck')(feats)
        if self.sepbn:
            return RetinaSepBNHeadNet(num_classes=self.num_classes,
                                      name='bbox_head')(feats, train=train)
        return RetinaHeadNet(num_classes=self.num_classes,
                             name='bbox_head')(feats)


@dataclass
class RetinaNetDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    backbone: Any = None  # dict spec, e.g. {'type': 'EfficientNet'}
    neck: Any = None  # dict or [dict] spec, e.g. {'type': 'NASFPN'}
    sepbn: bool = False  # RetinaSepBNHead (configs/nas_fpn)
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: RetinaTrainConfig = field(default_factory=RetinaTrainConfig)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        from ..backbones import backbone_spec_to_static
        from ..necks import neck_spec_to_static
        self.net = RetinaNetNet(num_classes=self.num_classes,
                                depth=self.depth,
                                compute_dtype=self.compute_dtype,
                                backbone_spec=backbone_spec_to_static(
                                    self.backbone)
                                if self.backbone else None,
                                neck_spec=neck_spec_to_static(self.neck)
                                if self.neck else None,
                                sepbn=self.sepbn)
        if self.sepbn:
            # expose the stateful-train protocol only when BN actually
            # trains — the Trainer dispatches on hasattr(loss_and_state)
            self.loss_and_state = self._loss_and_state
        self.anchor_generator = retina_anchor_generator()
        self.coder = DeltaXYWHBBoxCoder()
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
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def _loss_from_outputs(self, cls_lvl, reg_lvl, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = retina_targets(
            ctx, batch['gt'], batch['meta'].img_shape, self.num_classes,
            self.coder, self.train_cfg,
            num_base_anchors=self.anchor_generator.num_base_anchors)
        return retina_loss(cls_flat, reg_flat, targets, self.train_cfg)

    def loss(self, variables, batch):
        if self.sepbn:
            return self._loss_and_state(variables, batch)[0]
        cls_lvl, reg_lvl = self.forward_raw(variables, batch['images'])
        return self._loss_from_outputs(cls_lvl, reg_lvl, batch)

    def _loss_and_state(self, variables, batch, teacher_variables=None):
        """Train-mode path for the sepbn head: per-level BN uses batch
        statistics and returns updated running stats (the YOLOX
        loss_and_state protocol the Trainer already understands)."""
        (cls_lvl, reg_lvl), new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(batch['images']), train=True,
            mutable=['batch_stats'])
        losses = self._loss_from_outputs(cls_lvl, reg_lvl, batch)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        reg_lvl = [r.astype(jnp.float32) for r in reg_lvl]
        return retina_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                              self.coder, self.test_cfg,
                              num_classes=self.num_classes, rescale=rescale)
