"""Double-Head R-CNN: decoupled conv-reg / fc-cls two-stage detector.

Behavioural mirror of
/root/reference/mmdet/models/roi_heads/double_roi_head.py +
configs/double_heads/dh-faster-rcnn_r50_fpn_1x_coco.py: a standard
Faster R-CNN whose RoI stage extracts TWO feature sets — the cls
features from the proposals as-is and the reg features from proposals
enlarged 1.3x — feeding DoubleConvFCBBoxHead (conv branch regresses, fc
branch classifies), both losses weighted 2.0.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ..heads.bbox_head import rcnn_loss, rcnn_predict_single, \
    rcnn_sample_single, RCNNTrainConfig
from ..heads.double_bbox_head import DoubleConvFCBBoxHead, scale_rois
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


class DoubleHeadRCNNNet(FasterRCNNNet):
    def setup(self):
        super().setup()
        self.double_head = DoubleConvFCBBoxHead(
            num_classes=self.num_classes)

    def double_forward(self, cls_feats, reg_feats):
        return self.double_head(cls_feats, reg_feats)

    def __call__(self, images):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats)
        dummy = jnp.zeros((4, 7, 7, feats[0].shape[-1]), feats[0].dtype)
        head_out = self.double_head(dummy, dummy)
        return rpn_out, head_out


@dataclass
class DoubleHeadRCNNDetector(FasterRCNNDetector):
    reg_roi_scale_factor: float = 1.3
    rcnn_train_cfg: RCNNTrainConfig = field(
        default_factory=lambda: RCNNTrainConfig(cls_weight=2.0,
                                                bbox_weight=2.0))

    def __post_init__(self):
        super().__post_init__()
        self.net = DoubleHeadRCNNNet(num_classes=self.num_classes,
                                     depth=self.depth,
                                     compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _double_roi(self, variables, feats, rois, b):
        f32 = [f.astype(jnp.float32) for f in feats[:4]]
        align = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r))
        cls_f = align(*f32, rois)
        reg_f = align(*f32, scale_rois(rois, self.reg_roi_scale_factor))
        s = rois.shape[1]
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            cls_f.reshape(b * s, 7, 7, -1),
            reg_f.reshape(b * s, 7, 7, -1), method='double_forward')
        return (cls_logits.astype(jnp.float32),
                reg_preds.astype(jnp.float32))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                          batch['meta'].img_shape, rng, self.rpn_coder,
                          self.rpn_train_cfg)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        cls_logits, reg_preds = self._double_roi(variables, feats,
                                                 samples.rois, b)
        rcnn_losses, _ = rcnn_loss(cls_logits, reg_preds, samples,
                                   self.num_classes, self.rcnn_train_cfg)
        losses['loss_cls'] = rcnn_losses['loss_cls']
        losses['loss_bbox'] = rcnn_losses['loss_bbox']
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [c.astype(jnp.float32) for c in rpn_cls],
            [r.astype(jnp.float32) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        b, p = prop_boxes.shape[:2]
        cls_logits, reg_preds = self._double_roi(variables, feats,
                                                 prop_boxes, b)
        cls_logits = cls_logits.reshape(b, p, -1)
        reg_preds = reg_preds.reshape(b, p, -1)

        def single(cl, rg, rois, rmask, img_shape, scale_factor):
            ob, os_, ol, om = rcnn_predict_single(
                cl, rg, rois, rmask, img_shape, scale_factor,
                self.num_classes, self.rcnn_coder, self.test_cfg,
                rescale=rescale)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(cls_logits, reg_preds, prop_boxes,
                                prop_mask, batch['meta'].img_shape,
                                batch['meta'].scale_factor)
