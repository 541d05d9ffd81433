"""ATSS detector assembly (mirrors mmdet's atss_r50_fpn_1x config)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...task import AnchorGenerator
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import ResNet
from ..heads.atss_head import (ATSSHeadNet, atss_loss, atss_predict)
from ..heads.gfl_head import (AnchorContext, GFLTestConfig, GFLTrainConfig,
                              gfl_targets)
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class ATSSNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    # static neck spec (configs/dyhead: FPN -> DyHead chain)
    neck_spec: Any = None

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        if self.neck_spec is not None:
            from ..necks import NeckChain
            feats = NeckChain(spec=self.neck_spec, name='neck')(feats)
        else:
            feats = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                        add_extra_convs='on_output', num_outs=5,
                        name='neck')(feats)
        return ATSSHeadNet(num_classes=self.num_classes,
                           name='bbox_head')(feats)


@dataclass
class ATSSDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    neck: Any = None  # dict or [dict] spec, e.g. [FPN, DyHead]
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    anchor_generator: AnchorGenerator = field(default_factory=AnchorGenerator)
    train_cfg: GFLTrainConfig = field(default_factory=GFLTrainConfig)
    test_cfg: GFLTestConfig = field(default_factory=GFLTestConfig)

    def __post_init__(self):
        from ..necks import neck_spec_to_static
        self.net = ATSSNet(num_classes=self.num_classes, depth=self.depth,
                           compute_dtype=self.compute_dtype,
                           neck_spec=neck_spec_to_static(self.neck)
                           if self.neck else None)
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
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl, ctr_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        ctr_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in ctr_lvl], axis=1).astype(jnp.float32)
        targets = gfl_targets(ctx, batch['gt'], batch['meta'].img_shape,
                              self.num_classes,
                              topk=self.train_cfg.assigner_topk)
        return atss_loss(ctx, cls_flat, reg_flat, ctr_flat, targets,
                         self.coder, self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl, ctr_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        ctr_lvl = [c.astype(jnp.float32) for c in ctr_lvl]
        return atss_predict(ctx, cls_lvl, reg_lvl, ctr_lvl, batch['meta'],
                            self.coder, self.test_cfg,
                            num_classes=self.num_classes, rescale=rescale)
