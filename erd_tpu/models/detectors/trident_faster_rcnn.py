"""TridentNet: scale-aware trident branches on a C4 Faster R-CNN.

Behavioural mirror of
/root/reference/mmdet/models/detectors/trident_faster_rcnn.py +
backbones/trident_resnet.py + roi_heads/trident_roi_head.py +
configs/tridentnet/*: the C4 backbone's res4 runs 3 weight-shared
branches with dilations (1, 2, 3); training treats each branch as an
extra image sharing the gt annotations (the reference concatenates
proposals/gts per branch); inference uses only ``test_branch_idx``(=1) —
the middle, dilation-2 branch ("fast" TridentNet). Classic C4 head: a
single-level stride-16 RPN (scales 2..32) and a res5-style conv head on
14x14 RoI features with global average pooling.

Documented deviation: the reference's scale-aware training (per-branch
valid gt ranges) is omitted — all branches train on all gts.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align
from ...structures import DetResults
from ...task import AnchorGenerator
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import Bottleneck
from ..backbones.trident_resnet import TridentResNet
from ..heads.bbox_head import (RCNNTrainConfig, rcnn_loss,
                               rcnn_predict_single, rcnn_sample_single)
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.rpn_head import (ProposalConfig, RPNHeadNet, RPNTrainConfig,
                              rpn_loss, rpn_proposals)
from ..layers import cast_compute_params
from ..preprocessor import Preprocessor


class Res5Head(nn.Module):
    """res5-style conv head: 3 bottlenecks (first stride 2) + GAP + fcs."""
    num_classes: int

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats
        for b in range(3):
            x = Bottleneck(512, stride=2 if b == 0 else 1,
                           downsample=(b == 0),
                           name=f'res5_block{b}')(x)
        x = x.mean(axis=(1, 2))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)
        reg = nn.Dense(4 * self.num_classes,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls, reg


class TridentNetNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = TridentResNet(depth=self.depth,
                                      compute_dtype=self.compute_dtype)
        self.rpn_head = RPNHeadNet(num_base_anchors=15)
        self.bbox_head = Res5Head(num_classes=self.num_classes)

    def extract_feat(self, images):
        """(B, H, W, 3) -> (3B, H/16, W/16, 1024) branch-stacked C4."""
        return self.backbone(images)

    def rpn(self, feat):
        return self.rpn_head([feat])

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        c4 = self.extract_feat(images)
        rpn_out = self.rpn_head([c4])
        dummy = jnp.zeros((4, 14, 14, c4.shape[-1]), jnp.float32)
        head_out = self.bbox_head(dummy)
        return rpn_out, head_out


@dataclass
class TridentFasterRCNNDetector:
    num_classes: int = 80
    depth: int = 50
    num_branch: int = 3
    test_branch_idx: int = 1
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    rpn_train_cfg: RPNTrainConfig = field(default_factory=RPNTrainConfig)
    rcnn_train_cfg: RCNNTrainConfig = field(
        default_factory=RCNNTrainConfig)
    proposal_cfg_train: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=2000,
                                               max_per_img=500))
    proposal_cfg_test: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=1000,
                                               max_per_img=500))
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = TridentNetNet(num_classes=self.num_classes,
                                 depth=self.depth,
                                 compute_dtype=self.compute_dtype)
        self.anchor_generator = AnchorGenerator(
            strides=(16,), ratios=(0.5, 1.0, 2.0),
            scales=(2, 4, 8, 16, 32))
        self.rpn_coder = DeltaXYWHBBoxCoder()
        self.rcnn_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.1, 0.1, 0.2, 0.2))
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

    def _tile(self, x):
        return jnp.concatenate([x] * self.num_branch, axis=0)

    def loss(self, variables, batch):
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        c4 = self.net.apply(v, self.preprocessor(images),
                            method='extract_feat')      # (3B, h, w, C)
        rpn_cls, rpn_reg = self.net.apply(v, c4, method='rpn')
        nb = c4.shape[0]
        cls_flat = rpn_cls[0].reshape(nb, -1).astype(jnp.float32)
        reg_flat = rpn_reg[0].reshape(nb, -1, 4).astype(jnp.float32)

        gt = batch['gt']
        gt3 = jax.tree.map(self._tile, gt)
        meta3 = jax.tree.map(self._tile, batch['meta'])
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(
            ctx, cls_flat, reg_flat, gt3, meta3.img_shape, rng,
            self.rpn_coder, self.rpn_train_cfg,
            num_base_anchors=self.anchor_generator.num_base_anchors)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(rpn_cls[0].astype(jnp.float32))],
            [jax.lax.stop_gradient(rpn_reg[0].astype(jnp.float32))],
            meta3.img_shape, self.rpn_coder, self.proposal_cfg_train)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), nb)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, gt3.bboxes, gt3.labels, gt3.mask)
        s = samples.rois.shape[1]
        roi14 = jax.vmap(
            lambda f, r: roi_align(f, r, 14, 1.0 / 16.0, 2)
        )(c4.astype(jnp.float32), samples.rois)
        cls_logits, reg_preds = self.net.apply(
            v, roi14.reshape(nb * s, 14, 14, -1), method='roi_forward')
        rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                   reg_preds.astype(jnp.float32), samples,
                                   self.num_classes, self.rcnn_train_cfg)
        losses.update(rcnn_losses)
        return losses

    def predict(self, variables, batch, rescale=True):
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        b = images.shape[0]
        ctx = self.anchor_context(images.shape[1:3])
        c4 = self.net.apply(v, self.preprocessor(images),
                            method='extract_feat')
        # fast TridentNet: middle branch only (test_branch_idx)
        c4 = jax.lax.dynamic_slice_in_dim(
            c4, self.test_branch_idx * b, b, axis=0)
        rpn_cls, rpn_reg = self.net.apply(v, c4, method='rpn')
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [rpn_cls[0].astype(jnp.float32)],
            [rpn_reg[0].astype(jnp.float32)],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        p = prop_boxes.shape[1]
        roi14 = jax.vmap(
            lambda f, r: roi_align(f, r, 14, 1.0 / 16.0, 2)
        )(c4.astype(jnp.float32), prop_boxes)
        cls_logits, reg_preds = self.net.apply(
            v, roi14.reshape(b * p, 14, 14, -1), method='roi_forward')
        cls_logits = cls_logits.astype(jnp.float32).reshape(b, p, -1)
        reg_preds = reg_preds.astype(jnp.float32).reshape(b, p, -1)

        def single(cl, rg, rois, rmask, img_shape, scale_factor):
            ob, os_, ol, om = rcnn_predict_single(
                cl, rg, rois, rmask, img_shape, scale_factor,
                self.num_classes, self.rcnn_coder, self.test_cfg,
                rescale=rescale)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(cls_logits, reg_preds, prop_boxes,
                                prop_mask, batch['meta'].img_shape,
                                batch['meta'].scale_factor)
