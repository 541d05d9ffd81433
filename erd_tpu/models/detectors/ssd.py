"""SSD300 detector assembly (mirrors mmdet's ssd300_coco config)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.ssd_vgg import SSDVGG
from ..heads.gfl_head import GFLTestConfig
from ..heads.ssd_head import (SSDAnchorContext, SSDHeadNet, ssd_loss,
                              ssd_predict, ssd_targets)
from ..preprocessor import Preprocessor


class SSDNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32
    input_size: int = 300

    @nn.compact
    def __call__(self, images):
        from ..heads.ssd_head import SSD_RATIOS
        feats = SSDVGG(compute_dtype=self.compute_dtype,
                       input_size=self.input_size,
                       name='backbone')(images)
        per_cell = tuple(2 + 2 * len(r) for r in SSD_RATIOS[self.input_size])
        return SSDHeadNet(num_classes=self.num_classes,
                          anchors_per_cell=per_cell,
                          name='bbox_head')(feats)


@dataclass
class SSDDetector:
    num_classes: int = 80
    input_size: int = 300
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.02,
                                              iou_threshold=0.45,
                                              max_per_img=200))

    def __post_init__(self):
        self.net = SSDNet(num_classes=self.num_classes,
                          compute_dtype=self.compute_dtype,
                          input_size=self.input_size)
        self.coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
        self._ctx_cache: Dict[Tuple[int, int], SSDAnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> SSDAnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = SSDAnchorContext.build(
                key, self.input_size)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=None, batch_size=1):
        shape = tuple(image_shape or (self.input_size, self.input_size))
        dummy = jnp.zeros((batch_size,) + shape + (3,), jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes + 1) for m in cls_lvl],
            axis=1)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = ssd_targets(ctx, batch['gt'], self.num_classes,
                              self.coder)
        return ssd_loss(cls_flat, reg_flat, targets, self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        return ssd_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                           self.coder, self.num_classes, self.test_cfg,
                           rescale=rescale)


# ---------------------------------------------------------------------------
# SSDLite (MobileNetV2): reference configs/ssd/
# ssdlite_mobilenetv2-scratch_8xb24-600e_coco.py — MobileNetV2 C4/C5
# (96, 1280 ch) + 4 depthwise-separable extra pairs (out 512/256/256/128,
# all stride 2), depthwise SSD head (per level: depthwise 3x3 BN ReLU6 ->
# 1x1 conv), explicit anchor tables (strides 16..320, ratios [2,3]x6,
# min/max sizes from the config).
# ---------------------------------------------------------------------------

SSDLITE_STRIDES = (16, 32, 64, 107, 160, 320)
SSDLITE_RATIOS = ((2, 3),) * 6
SSDLITE_SIZES = ((48, 100), (100, 150), (150, 202), (202, 253),
                 (253, 304), (304, 320))


class SSDLiteNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        from ..backbones.mobilenet_v2 import MobileNetV2, _ConvBNReLU6
        x = images.astype(self.compute_dtype)
        c4, c5 = MobileNetV2(out_indices=(4, 7),
                             name='backbone')(x, train)
        feats = [c4, c5]
        # SSDNeck use_depthwise extras: 1x1 BN ReLU6 to out//2, then
        # depthwise 3x3/s2 + pointwise 1x1 (each BN ReLU6)
        x = c5
        for i, out in enumerate((512, 256, 256, 128)):
            x = _ConvBNReLU6(out // 2, 1, name=f'extra{i}_reduce')(x, train)
            x = _ConvBNReLU6(out // 2, 3, stride=2, groups=out // 2,
                             name=f'extra{i}_dw')(x, train)
            x = _ConvBNReLU6(out, 1, name=f'extra{i}_pw')(x, train)
            feats.append(x)
        # depthwise head: per level depthwise 3x3 BN ReLU6 -> 1x1 conv
        cls_out, reg_out = [], []
        for i, f in enumerate(feats):
            ch = f.shape[-1]
            a = 2 + 2 * len(SSDLITE_RATIOS[i])
            fc = _ConvBNReLU6(ch, 3, groups=ch,
                              name=f'cls_dw_{i}')(f, train)
            cls_out.append(nn.Conv(a * (self.num_classes + 1), (1, 1),
                                   name=f'cls_conv_{i}')(fc)
                           .astype(jnp.float32))
            fr = _ConvBNReLU6(ch, 3, groups=ch,
                              name=f'reg_dw_{i}')(f, train)
            reg_out.append(nn.Conv(a * 4, (1, 1),
                                   name=f'reg_conv_{i}')(fr)
                           .astype(jnp.float32))
        return cls_out, reg_out


@dataclass
class SSDLiteDetector(SSDDetector):
    input_size: int = 320

    def __post_init__(self):
        super().__post_init__()
        self.net = SSDLiteNet(num_classes=self.num_classes,
                              compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> SSDAnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = SSDAnchorContext.build(
                key, strides=SSDLITE_STRIDES, lvl_ratios=SSDLITE_RATIOS,
                level_sizes=SSDLITE_SIZES)
        return self._ctx_cache[key]

    def loss_and_state(self, variables, batch):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        (cls_lvl, reg_lvl), new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes + 1) for m in cls_lvl],
            axis=1)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = ssd_targets(ctx, batch['gt'], self.num_classes,
                              self.coder)
        losses = ssd_loss(cls_flat, reg_flat, targets, self.num_classes)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]
