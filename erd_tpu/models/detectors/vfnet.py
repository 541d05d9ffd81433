"""VarifocalNet (VFNet) detector assembly.

Mirrors /root/reference/mmdet/models/detectors/vfnet.py +
configs/vfnet/vfnet_r50_fpn_1x_coco.py: R50 + FPN (on_output extras,
relu_before_extra_convs) + star-DCN VFNet head with ATSS assignment and
varifocal classification.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.gfl_head import GFLTestConfig
from ..heads.vfnet_head import (VFNetContext, VFNetHeadNet, decode_levels,
                                vfnet_loss, vfnet_predict)
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class VFNetNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32
    # mdconv c3-c5 recipes (reference configs/vfnet/
    # vfnet_r50-mdconv-c3-c5_fpn_ms-2x_coco.py: backbone DCNv2 stages)
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
                    add_extra_convs='on_output',
                    relu_before_extra_convs=True, num_outs=5,
                    name='neck')(feats)
        return VFNetHeadNet(num_classes=self.num_classes,
                            name='bbox_head')(feats)


@dataclass
class VFNetDetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True  # VFNet ships mdconv (DCNv2) variants only
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = VFNetNet(num_classes=self.num_classes, depth=self.depth,
                            compute_dtype=self.compute_dtype,
                            dcn_stages=tuple(self.dcn_stages),
                            dcn_modulated=self.dcn_modulated)
        self._ctx_cache: Dict[Tuple[int, int], VFNetContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> VFNetContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = VFNetContext.build(key)
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
        ctx = self.context(images.shape[1:3])
        cls_lvl, ini_lvl, ref_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        ini_xyxy = decode_levels(ctx, ini_lvl)
        ref_xyxy = decode_levels(ctx, ref_lvl)
        cls = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl], axis=1)
        ini = jnp.concatenate([m.reshape(b, -1, 4) for m in ini_xyxy],
                              axis=1)
        ref = jnp.concatenate([m.reshape(b, -1, 4) for m in ref_xyxy],
                              axis=1)
        return vfnet_loss(ctx, cls, ini, ref, batch['gt'],
                          self.num_classes)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, _, ref_lvl = self.forward_raw(variables, images)
        ref_xyxy = decode_levels(ctx, ref_lvl)
        return vfnet_predict(ctx, cls_lvl, ref_xyxy, batch['meta'],
                             self.test_cfg, self.num_classes,
                             rescale=rescale)
