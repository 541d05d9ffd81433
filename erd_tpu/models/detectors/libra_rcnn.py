"""Libra R-CNN: balanced learning on the Faster R-CNN skeleton.

Behavioural mirror of the reference's Libra components
(configs/libra_rcnn/libra-faster-rcnn_r50_fpn_1x_coco.py):
- BFP neck refinement after FPN (necks/bfp.py, non-local refine at level 2)
- IoU-balanced negative sampling + instance-balanced positive sampling
  in the RCNN stage (task_modules/samplers/iou_balanced_neg_sampler.py,
  instance_balanced_pos_sampler.py)
- BalancedL1 regression loss (losses/balanced_l1_loss.py,
  alpha 0.5 / gamma 1.5 / beta 1.0)
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import balanced_l1_loss, cross_entropy_int
from ...task.max_iou import max_iou_assign
from ...task.samplers import (SampleResult, instance_balanced_pos_sample,
                              iou_balanced_neg_sample)
from ..backbones.resnet import ResNet
from ..heads.bbox_head import RoISamples, Shared2FCBBoxHead
from ..heads.rpn_head import RPNHeadNet
from ..necks.fpn import FPN
from ..necks.pyramid_extras import BFP
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


class LibraRCNNNet(FasterRCNNNet):
    """Faster R-CNN net with the BFP refinement after FPN."""

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512), 34: (64, 128, 256, 512)}.get(
            self.depth, (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                        add_extra_convs='', num_outs=5)
        self.bfp = BFP(num_levels=5, refine_level=2,
                       refine_type='non_local')
        self.rpn_head = RPNHeadNet()
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes)

    def extract_feat(self, images):
        return self.bfp(self.neck(self.backbone(images)))


def libra_sample_single(rng, proposals, prop_mask, gt_b, gt_l, gt_m,
                        num_classes, coder, cfg):
    """rcnn_sample_single with Libra's combined sampler."""
    if cfg.add_gt_as_proposals:
        proposals = jnp.concatenate([gt_b, proposals])
        prop_mask = jnp.concatenate([gt_m, prop_mask])
    res = max_iou_assign(proposals, gt_b, gt_l, gt_m,
                         pos_iou_thr=cfg.pos_iou_thr,
                         neg_iou_thr=cfg.neg_iou_thr,
                         min_pos_iou=cfg.min_pos_iou,
                         match_low_quality=False, valid_flags=prop_mask)
    neg_mask = (~res.pos_mask) & (res.labels != -2) & prop_mask
    pos_mask = res.pos_mask & prop_mask
    n_pos_slots = int(cfg.num_samples * cfg.pos_fraction)
    pos_idx, pos_ok = instance_balanced_pos_sample(
        rng, pos_mask, res.gt_idx, gt_b.shape[0], n_pos_slots)
    neg = iou_balanced_neg_sample(
        jax.random.fold_in(rng, 3), jnp.zeros_like(pos_mask), neg_mask,
        res.max_overlaps, num=cfg.num_samples,
        pos_fraction=cfg.pos_fraction, num_bins=3,
        neg_iou_ceiling=cfg.neg_iou_thr)
    neg_idx = neg.idx[n_pos_slots:]
    neg_ok = neg.valid[n_pos_slots:]
    idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([jnp.ones_like(pos_idx, bool),
                              jnp.zeros_like(neg_idx, bool)])
    valid = jnp.concatenate([pos_ok, neg_ok])
    sample = SampleResult(idx=idx, is_pos=is_pos, valid=valid)

    rois = proposals[sample.idx]
    labels = jnp.where(sample.is_pos & sample.valid,
                       res.labels[sample.idx], num_classes)
    deltas = coder.encode(rois, gt_b[res.gt_idx[sample.idx]])
    deltas = jnp.nan_to_num(deltas, nan=0.0, posinf=0.0, neginf=0.0)
    return RoISamples(rois=rois, labels=labels.astype(jnp.int32),
                      deltas=deltas, is_pos=sample.is_pos & sample.valid,
                      valid=sample.valid, gt_idx=res.gt_idx[sample.idx])


def libra_rcnn_loss(cls_logits, reg_preds, samples: RoISamples, num_classes,
                    cfg):
    """rcnn_loss with BalancedL1 instead of plain L1."""
    labels = samples.labels.reshape(-1)
    valid = samples.valid.reshape(-1)
    is_pos = samples.is_pos.reshape(-1)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    ce = cross_entropy_int(cls_logits, labels)
    loss_cls = cfg.cls_weight * (ce * valid).sum() / n_valid
    r = reg_preds.reshape(reg_preds.shape[0], -1, 4)
    safe = jnp.clip(labels, 0, r.shape[1] - 1)
    reg_at_label = jnp.take_along_axis(
        r, safe[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    bl1 = balanced_l1_loss(reg_at_label, samples.deltas.reshape(-1, 4),
                           beta=1.0, alpha=0.5, gamma=1.5,
                           reduction='none').sum(-1)
    loss_bbox = cfg.bbox_weight * (bl1 * is_pos).sum() / n_valid
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox), None


@dataclass
class LibraRCNNDetector(FasterRCNNDetector):
    def __post_init__(self):
        super().__post_init__()
        self.net = LibraRCNNNet(num_classes=self.num_classes,
                                depth=self.depth,
                                compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def loss(self, variables, batch):
        from ..heads.rpn_head import rpn_loss, rpn_proposals
        from ...ops.roi_align import multilevel_roi_align
        from ..layers import cast_compute_params

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
        prop_boxes, prop_scores, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: libra_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        s = samples.rois.shape[1]
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi_feats.reshape(b * s, 7, 7, -1),
            method='roi_forward')
        rcnn_losses, _ = libra_rcnn_loss(
            cls_logits.astype(jnp.float32), reg_preds.astype(jnp.float32),
            samples, self.num_classes, self.rcnn_train_cfg)
        losses['loss_cls'] = rcnn_losses['loss_cls']
        losses['loss_bbox'] = rcnn_losses['loss_bbox']
        return losses
