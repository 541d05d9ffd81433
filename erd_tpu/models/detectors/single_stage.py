"""Single-stage detector assembly (GFL flagship).

Functional re-design of the reference's detector classes
(/root/reference/mmdet/models/detectors/base.py:58-99, single_stage.py:28-149,
gfl.py:12-46): the three forward modes become three pure functions over an
immutable params pytree —
    forward_raw  == mode='tensor'   (head outputs)
    loss         == mode='loss'
    predict      == mode='predict'
so teacher/student co-execution, jit, vmap, grad and pjit all compose freely.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...task import AnchorGenerator
from ..backbones import (backbone_spec_to_static,
                         build_swappable_backbone)
from ..backbones.resnet import ResNet
from ..heads.gfl_head import (AnchorContext, GFLHeadNet, GFLTestConfig,
                              GFLTrainConfig, flatten_levels, gfl_loss,
                              gfl_predict, gfl_targets)
from ..necks import neck_spec_to_static
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class GFLNet(nn.Module):
    """backbone -> neck -> dense head, NHWC.

    ``remat=True`` checkpoints the backbone and head towers
    (jax.checkpoint): activations are recomputed in the backward pass,
    trading ~1/3 extra FLOPs for several GB of peak memory — useful for the
    fused teacher+student ERD step at large batch/resolution.
    """
    num_classes: int
    depth: int = 50
    neck_out: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    compute_dtype: Any = jnp.float32
    remat: bool = False
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    # True = DCNv2 (modulated); False = DCNv1 (reference dcn=dict(
    # type='DCN') vs type='DCNv2' — configs/dcn vs configs/dcnv2)
    dcn_modulated: bool = True
    context_block_stages: Tuple[bool, ...] = (False, False, False, False)
    context_block_ratio: float = 0.25
    gen_attention_stages: Tuple[bool, ...] = (False, False, False, False)
    # stem+layer1 frozen is the reference 1x recipe default; the matching
    # zero-update optimizer mask lives in engine/optim.py
    frozen_stages: int = 1
    # static (hashable) backbone spec tuple — swaps ResNet for any
    # SWAPPABLE_BACKBONES entry (configs/swin, configs/regnet, ...)
    backbone_spec: Any = None
    # static neck spec tuple — swaps the default FPN for any
    # SWAPPABLE_NECKS chain (configs/pafpn, configs/dyhead, ...)
    neck_spec: Any = None

    @nn.compact
    def __call__(self, images, return_feats: bool = False):
        if self.backbone_spec is not None:
            feats = build_swappable_backbone(
                dict(self.backbone_spec), self.compute_dtype,
                name='backbone')(images)
        else:
            backbone_cls = nn.remat(ResNet) if self.remat else ResNet
            feats = backbone_cls(
                depth=self.depth, compute_dtype=self.compute_dtype,
                frozen_stages=self.frozen_stages,
                dcn_stages=self.dcn_stages,
                dcn_modulated=self.dcn_modulated,
                context_block_stages=self.context_block_stages,
                context_block_ratio=self.context_block_ratio,
                gen_attention_stages=self.gen_attention_stages,
                name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        if self.neck_spec is not None:
            from ..necks import NeckChain
            feats = NeckChain(spec=self.neck_spec, name='neck')(feats)
        else:
            feats = FPN(in_channels=in_ch, out_channels=self.neck_out,
                        start_level=1, add_extra_convs='on_output',
                        num_outs=5, name='neck')(feats)
        if return_feats:
            # extract_feat mode (single_stage.py:136-149): FPN pyramid only,
            # used by the replay/exemplar scoring helpers.
            return feats
        head_cls = nn.remat(GFLHeadNet) if self.remat else GFLHeadNet
        return head_cls(num_classes=self.num_classes,
                        in_channels=self.neck_out,
                        feat_channels=self.neck_out,
                        stacked_convs=self.stacked_convs,
                        reg_max=self.reg_max, name='bbox_head')(feats)


@dataclass
class GFLDetector:
    """Config + pure functions; holds no mutable state besides cached anchors."""
    num_classes: int = 80
    depth: int = 50
    reg_max: int = 16
    compute_dtype: Any = jnp.float32
    remat: bool = False
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    context_block_stages: Tuple[bool, ...] = (False, False, False, False)
    context_block_ratio: float = 0.25
    gen_attention_stages: Tuple[bool, ...] = (False, False, False, False)
    frozen_stages: int = 1
    backbone: Any = None  # dict spec, e.g. {'type': 'SwinTransformer'}
    neck: Any = None  # dict or [dict] spec, e.g. {'type': 'PAFPN', ...}
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    anchor_generator: AnchorGenerator = field(default_factory=AnchorGenerator)
    train_cfg: GFLTrainConfig = field(default_factory=GFLTrainConfig)
    test_cfg: GFLTestConfig = field(default_factory=GFLTestConfig)

    def __post_init__(self):
        self.net = GFLNet(num_classes=self.num_classes, depth=self.depth,
                          reg_max=self.reg_max,
                          compute_dtype=self.compute_dtype,
                          remat=self.remat, dcn_stages=self.dcn_stages,
                          dcn_modulated=self.dcn_modulated,
                          context_block_stages=self.context_block_stages,
                          context_block_ratio=self.context_block_ratio,
                          gen_attention_stages=self.gen_attention_stages,
                          frozen_stages=self.frozen_stages,
                          backbone_spec=backbone_spec_to_static(
                              self.backbone) if self.backbone else None,
                          neck_spec=neck_spec_to_static(self.neck)
                          if self.neck else None)
        self._ctx_cache: Dict[Tuple[int, int], AnchorContext] = {}
        if self.preprocessor.compute_dtype != self.compute_dtype:
            self.preprocessor = replace(self.preprocessor,
                                        compute_dtype=self.compute_dtype)
        # Jitted entry points (per-op dispatch is prohibitively slow; every
        # public path is compiled once per shape bucket).
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    # -- anchors --------------------------------------------------------
    def anchor_context(self, image_shape) -> AnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = AnchorContext.build(
                key, self.anchor_generator)
        return self._ctx_cache[key]

    # -- params ---------------------------------------------------------
    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        # jit: eager per-op init dispatch is ~100x slower in this runtime.
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    # -- modes ----------------------------------------------------------
    def forward_raw(self, variables, images):
        """mode='tensor': per-level (cls_scores, bbox_preds), NHWC."""
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        """mode='loss'. batch: dict(images, gt: GTInstances, meta: ImageMeta)."""
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        targets = gfl_targets(ctx, batch['gt'], batch['meta'].img_shape,
                              self.num_classes,
                              topk=self.train_cfg.assigner_topk,
                              pad_divisor=self.train_cfg.pad_divisor)
        cls_flat = flatten_levels(cls_lvl).astype(jnp.float32)
        reg_flat = flatten_levels(reg_lvl).astype(jnp.float32)
        return gfl_loss(ctx, cls_flat, reg_flat, targets, self.train_cfg,
                        reg_max=self.reg_max)

    def predict(self, variables, batch, rescale=True):
        """mode='predict': DetResults in original-image frame."""
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        cls_lvl = [c.astype(jnp.float32) for c in cls_lvl]
        reg_lvl = [r.astype(jnp.float32) for r in reg_lvl]
        return gfl_predict(ctx, cls_lvl, reg_lvl, batch['meta'],
                           self.test_cfg, reg_max=self.reg_max,
                           rescale=rescale)
