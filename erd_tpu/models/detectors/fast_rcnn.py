"""Fast R-CNN + standalone RPN detectors.

Behavioural mirrors of /root/reference/mmdet/models/detectors/fast_rcnn.py
(the two-stage detector consuming PRE-COMPUTED proposals — batches carry
``proposals``/``proposals_mask`` instead of running the RPN) and rpn.py
(the proposal network as a detector: class-agnostic detections straight
from rpn_proposals, label 0).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ..heads.bbox_head import (rcnn_loss, rcnn_predict_single,
                               rcnn_sample_single)
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector


@dataclass
class FastRCNNDetector(FasterRCNNDetector):
    """RoI head only; proposals must be provided in the batch."""

    def loss(self, variables, batch):
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), method='extract_feat')
        b = images.shape[0]
        prop_boxes = batch['proposals']
        prop_mask = batch['proposals_mask']
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        rngs = jax.random.split(rng, b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        s = samples.rois.shape[1]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                              reg_preds.astype(jnp.float32), samples,
                              self.num_classes, self.rcnn_train_cfg)
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), method='extract_feat')
        prop_boxes = batch['proposals']
        prop_mask = batch['proposals_mask']
        b, p = prop_boxes.shape[:2]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          prop_boxes)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi7.reshape(b * p, 7, 7, -1), method='roi_forward')
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


@dataclass
class RPNDetector(FasterRCNNDetector):
    """RPN as a standalone class-agnostic detector (rpn.py)."""

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        _, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        return rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                        batch['meta'].img_shape, rng, self.rpn_coder,
                        self.rpn_train_cfg)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        _, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        boxes, scores, mask = rpn_proposals(
            ctx, [c.astype(jnp.float32) for c in rpn_cls],
            [r.astype(jnp.float32) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        if rescale:
            from ...structures.boxes import scale_boxes
            boxes = jax.vmap(
                lambda bx, sf: scale_boxes(bx, 1.0 / sf))(
                boxes, batch['meta'].scale_factor)
        d = min(self.test_cfg.max_per_img, boxes.shape[1])
        return DetResults(
            bboxes=boxes[:, :d], scores=scores[:, :d],
            labels=jnp.zeros(boxes[:, :d].shape[:2], jnp.int32),
            mask=mask[:, :d])
