"""Cascade R-CNN: IoU-progressive multi-stage RoI refinement.

Behavioural mirror of /root/reference/mmdet/models/detectors/cascade_rcnn.py
+ roi_heads/cascade_roi_head.py with the cascade-rcnn_r50_fpn config:
3 bbox stages at pos-IoU 0.5/0.6/0.7, per-stage delta stds
(.1,.1,.2,.2)/(.05,.05,.1,.1)/(.033,.033,.067,.067), stage loss weights
(1, 0.5, 0.25), class-agnostic regression; inference averages the three
stages' softmax scores on the final refined boxes.

TPU design: every stage operates on fixed-size RoI sets (1000 proposals /
512 sampled) with validity masks; stage-to-stage refinement is a pure
decode (no dynamic filtering), so the whole 3-stage cascade is one jitted
program — the reference's per-stage python loop over images disappears
into vmap.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...ops import nms_select
from ...ops.misc import cap_candidates
from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ..heads.bbox_head import (RCNNTrainConfig, Shared2FCBBoxHead,
                               rcnn_loss, rcnn_sample_single)
from ..heads.rpn_head import rpn_loss, rpn_proposals
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


class CascadeRCNNNet(FasterRCNNNet):
    num_stages: int = 3

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..heads.rpn_head import RPNHeadNet
        from ..necks.fpn import FPN
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512), 34: (64, 128, 256, 512)}.get(
            self.depth, (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                        add_extra_convs='', num_outs=5)
        self.rpn_head = RPNHeadNet()
        self.cascade_heads = [
            Shared2FCBBoxHead(num_classes=self.num_classes,
                              reg_class_agnostic=True,
                              name=f'bbox_head_{i}')
            for i in range(self.num_stages)
        ]

    def roi_forward_stage(self, roi_feats, stage: int):
        return self.cascade_heads[stage](roi_feats)

    def __call__(self, images):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats)
        dummy = jnp.zeros((4, 7, 7, feats[0].shape[-1]), feats[0].dtype)
        outs = [h(dummy) for h in self.cascade_heads]
        return rpn_out, outs


@dataclass
class CascadeRCNNDetector(FasterRCNNDetector):
    num_stages: int = 3
    stage_ious: Tuple[float, ...] = STAGE_IOUS
    stage_weights: Tuple[float, ...] = STAGE_WEIGHTS

    def __post_init__(self):
        super().__post_init__()
        self.net = CascadeRCNNNet(num_classes=self.num_classes,
                                  depth=self.depth,
                                  compute_dtype=self.compute_dtype,
                                  num_stages=self.num_stages)
        self.stage_coders = [DeltaXYWHBBoxCoder(target_stds=s)
                             for s in STAGE_STDS[:self.num_stages]]
        self.stage_cfgs = [
            replace(self.rcnn_train_cfg, pos_iou_thr=t, neg_iou_thr=t,
                    min_pos_iou=t)
            for t in self.stage_ious
        ]
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _roi_feats(self, feats, rois):
        return jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32), rois)

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

        for stage in range(self.num_stages):
            coder = self.stage_coders[stage]
            cfg = self.stage_cfgs[stage]
            rngs = jax.random.split(jax.random.fold_in(rng, stage + 1), b)
            samples = jax.vmap(
                lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                    k, p, pm, gb, gl, gm, self.num_classes, coder, cfg)
            )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
              batch['gt'].labels, batch['gt'].mask)

            s = samples.rois.shape[1]
            roi_feats = self._roi_feats(feats, samples.rois)
            cls_logits, reg_preds = self.net.apply(
                cast_compute_params(variables, self.compute_dtype), roi_feats.reshape(b * s, 7, 7, -1), stage,
                method=CascadeRCNNNet.roi_forward_stage)
            cls_logits = cls_logits.astype(jnp.float32)
            reg_preds = reg_preds.astype(jnp.float32)
            stage_losses, _ = rcnn_loss(cls_logits, reg_preds, samples,
                                        self.num_classes, cfg)
            w = self.stage_weights[stage]
            losses[f'loss_cls_s{stage}'] = w * stage_losses['loss_cls']
            losses[f'loss_bbox_s{stage}'] = w * stage_losses['loss_bbox']

            if stage + 1 < self.num_stages:
                # refine: decode this stage's (detached) deltas at its RoIs
                # -> next stage's proposals (cascade_roi_head.refine_bboxes)
                deltas = jax.lax.stop_gradient(
                    reg_preds.reshape(b, s, 4))
                prop_boxes = jax.vmap(
                    lambda r, d, shp: coder.decode(r, d, max_shape=shp)
                )(samples.rois, deltas, batch['meta'].img_shape)
                prop_mask = samples.valid
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        rois, _, roi_mask = rpn_proposals(
            ctx, [c.astype(jnp.float32) for c in rpn_cls],
            [r.astype(jnp.float32) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        b, p = rois.shape[:2]

        ms_scores = []
        for stage in range(self.num_stages):
            roi_feats = self._roi_feats(feats, rois)
            cls_logits, reg_preds = self.net.apply(
                cast_compute_params(variables, self.compute_dtype), roi_feats.reshape(b * p, 7, 7, -1), stage,
                method=CascadeRCNNNet.roi_forward_stage)
            cls_logits = cls_logits.astype(jnp.float32).reshape(b, p, -1)
            reg_preds = reg_preds.astype(jnp.float32).reshape(b, p, 4)
            ms_scores.append(jax.nn.softmax(cls_logits, axis=-1))
            coder = self.stage_coders[stage]
            rois = jax.vmap(
                lambda r, d, shp: coder.decode(r, d, max_shape=shp)
            )(rois, reg_preds, batch['meta'].img_shape)

        scores = sum(ms_scores) / self.num_stages  # (B, P, C+1)
        cfg = self.test_cfg

        def single(sc, boxes, rmask, scale_factor):
            c = sc.shape[-1] - 1
            flat_scores = sc[:, :c].reshape(-1)
            flat_boxes = jnp.repeat(boxes, c, axis=0)
            labels = jnp.tile(jnp.arange(c, dtype=jnp.int32),
                              boxes.shape[0])
            valid = jnp.repeat(rmask, c) & (flat_scores > cfg.score_thr)
            top_s, vmask, top_b, top_l = cap_candidates(
                flat_scores, valid, cfg.pre_nms_total, flat_boxes, labels)
            if rescale:
                top_b = scale_boxes(top_b, 1.0 / scale_factor)
            ob, os_, ol, om = nms_select(top_b, top_s, top_l,
                                         cfg.iou_threshold, cfg.max_per_img,
                                         valid_mask=vmask)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(scores, rois, roi_mask,
                                batch['meta'].scale_factor)
