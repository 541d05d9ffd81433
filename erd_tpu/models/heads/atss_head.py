"""ATSS dense head (anchor-based + centerness), TPU-native.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/atss_head.py:
GN conv towers, one anchor/cell (octave scale 8), ATSS assignment, FocalLoss
cls, GIoU on DeltaXYWH-decoded boxes weighted by centerness targets
(avg = sum of centerness targets), BCE centerness. Shares AnchorContext and
the vmapped ATSS assigner with the GFL head.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (binary_cross_entropy_with_logits, giou_loss,
                       sigmoid_focal_loss)
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad
from .gfl_head import AnchorContext, GFLTestConfig, gfl_targets


class ATSSHeadNet(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        atss_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='atss_cls')
        atss_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='atss_reg')
        atss_centerness = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='atss_centerness')
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]
        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            cf = x
            rf = x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            cls_out.append(atss_cls(cf))
            reg_out.append(
                scales[lvl](atss_reg(rf)).astype(jnp.float32))
            ctr_out.append(atss_centerness(rf))
        return cls_out, reg_out, ctr_out


def atss_centerness_target(anchors, gts):
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) from anchor centers."""
    cx = (anchors[..., 0] + anchors[..., 2]) / 2
    cy = (anchors[..., 1] + anchors[..., 3]) / 2
    l_ = cx - gts[..., 0]
    r_ = gts[..., 2] - cx
    t_ = cy - gts[..., 1]
    b_ = gts[..., 3] - cy
    eps = 1e-12
    lr = jnp.minimum(l_, r_) / jnp.maximum(jnp.maximum(l_, r_), eps)
    tb = jnp.minimum(t_, b_) / jnp.maximum(jnp.maximum(t_, b_), eps)
    return jnp.sqrt(jnp.clip(lr * tb, 0.0, None))


def atss_loss(ctx: AnchorContext, cls_scores, bbox_preds, centernesses,
              targets, coder: DeltaXYWHBBoxCoder, num_classes,
              cls_weight=1.0, bbox_weight=2.0, centerness_weight=1.0):
    """cls (B,N,C); bbox (B,N,4) deltas; centernesses (B,N). Targets from
    gfl_targets (same ATSS assignment; bbox_targets are raw gt boxes)."""
    b, n, c = cls_scores.shape
    anchors = jnp.asarray(ctx.anchors)[None]
    pos = targets.pos_mask
    num_pos = jnp.maximum(targets.num_pos, 1.0)

    loss_cls = cls_weight * sigmoid_focal_loss(
        cls_scores.reshape(-1, c), targets.labels.reshape(-1),
        weight=targets.label_weights.reshape(-1), avg_factor=num_pos)

    decoded = coder.decode(anchors, bbox_preds)
    ctr_t = jnp.where(pos, atss_centerness_target(anchors,
                                                  targets.bbox_targets), 0.0)
    denom = jnp.maximum(ctr_t.sum(), 1e-6)
    lb = giou_loss(decoded.reshape(-1, 4),
                   targets.bbox_targets.reshape(-1, 4), reduction='none')
    loss_bbox = bbox_weight * (lb * ctr_t.reshape(-1)).sum() / denom

    ctr_bce = binary_cross_entropy_with_logits(centernesses, ctr_t)
    loss_centerness = centerness_weight * (ctr_bce * pos).sum() / num_pos
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_centerness=loss_centerness)


def atss_predict(ctx: AnchorContext, cls_lvl, reg_lvl, ctr_lvl, meta,
                 coder: DeltaXYWHBBoxCoder,
                 cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.6),
                 num_classes=80, rescale=True) -> DetResults:
    b = cls_lvl[0].shape[0]
    anchors_np = ctx.anchors
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_by_lvl, reg_by_lvl, ctr_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(cls_by_lvl[lvl])
            ctr = jax.nn.sigmoid(ctr_by_lvl[lvl][:, 0])
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(anchors_np[slices[lvl]:slices[lvl + 1]])
            boxes = coder.decode(pri[top_idx], reg_by_lvl[lvl][top_idx],
                                 max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s * ctr[top_idx])
            labels_all.append(top_lab)
            mask_all.append(mask)
        boxes = jnp.concatenate(boxes_all)
        scores = jnp.concatenate(scores_all)
        labels = jnp.concatenate(labels_all)
        valid = jnp.concatenate(mask_all)
        scores, valid, boxes, labels = cap_candidates(
            scores, valid, cfg.pre_nms_total, boxes, labels)
        if rescale:
            boxes = scale_boxes(boxes, 1.0 / scale_factor)
        ob, os_, ol, om = nms_select(boxes, scores, labels,
                                     cfg.iou_threshold, cfg.max_per_img,
                                     valid_mask=valid)
        return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

    cls_b = [m.reshape(b, -1, num_classes) for m in cls_lvl]
    reg_b = [m.reshape(b, -1, 4) for m in reg_lvl]
    ctr_b = [m.reshape(b, -1, 1) for m in ctr_lvl]
    return jax.vmap(single)(cls_b, reg_b, ctr_b, meta.img_shape,
                            meta.scale_factor)
