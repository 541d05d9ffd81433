"""RetinaNet dense head (anchor-based, focal loss), TPU-native.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/retina_head.py
+ anchor_head.py: 9 anchors/cell (octave scale 4 x 3 scales x 3 ratios),
MaxIoU assignment (pos 0.5 / neg 0.4), FocalLoss + L1 on DeltaXYWH-encoded
targets, sigmoid scores with per-level top-k then class-aware NMS. Same
static-shape conversions as the GFL head (dense masks, vmapped assigner).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import l1_loss, sigmoid_focal_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task import AnchorGenerator
from ...task.anchors import valid_flags_jax
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ..layers import bias_init_prob, torch_pad
from .gfl_head import AnchorContext, GFLTestConfig


def retina_anchor_generator():
    return AnchorGenerator(strides=(8, 16, 32, 64, 128),
                           ratios=(0.5, 1.0, 2.0), octave_base_scale=4,
                           scales_per_octave=3)


class RetinaHeadNet(nn.Module):
    """4-conv cls/reg towers (no norm) + A*C cls and A*4 reg conv heads."""
    num_classes: int
    num_base_anchors: int = 9
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_relu: bool = False  # FSAF: TBLR outputs must be positive
    reg_bias_init: float = 0.0  # FSAF uses 0.25 (fsaf_head.py:53-67)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs_cls = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        convs_reg = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        retina_cls = nn.Conv(self.num_base_anchors * self.num_classes,
                             (3, 3), padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=bias_init_prob(0.01),
                             name='retina_cls')
        retina_reg = nn.Conv(self.num_base_anchors * 4, (3, 3),
                             padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=nn.initializers.constant(
                                 self.reg_bias_init),
                             name='retina_reg')
        cls_out, reg_out = [], []
        for x in feats:
            c = x
            r = x
            for conv in convs_cls:
                c = nn.relu(conv(c))
            for conv in convs_reg:
                r = nn.relu(conv(r))
            cls_out.append(retina_cls(c))
            reg = retina_reg(r).astype(jnp.float32)
            reg_out.append(nn.relu(reg) if self.reg_relu else reg)
        return cls_out, reg_out


class RetinaSepBNHeadNet(nn.Module):
    """RetinaHead with shared convs but per-level BatchNorm — the NAS-FPN
    training recipe (retina_sepbn_head.py:44-84 + configs/nas_fpn/*: conv
    weights tied across FPN levels, one BN per level, conv->BN->ReLU with
    bias-free convs, trainable BN stats threaded via loss_and_state)."""
    num_classes: int
    num_base_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        convs_cls = [
            nn.Conv(self.feat_channels, (3, 3), use_bias=False,
                    padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        convs_reg = [
            nn.Conv(self.feat_channels, (3, 3), use_bias=False,
                    padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        bns_cls = [[nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f'cls_bn_l{lvl}_{i}')
                    for i in range(self.stacked_convs)]
                   for lvl in range(self.num_levels)]
        bns_reg = [[nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f'reg_bn_l{lvl}_{i}')
                    for i in range(self.stacked_convs)]
                   for lvl in range(self.num_levels)]
        retina_cls = nn.Conv(self.num_base_anchors * self.num_classes,
                             (3, 3), padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=bias_init_prob(0.01),
                             name='retina_cls')
        retina_reg = nn.Conv(self.num_base_anchors * 4, (3, 3),
                             padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             name='retina_reg')
        assert len(feats) == self.num_levels
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            c = x
            r = x
            for i in range(self.stacked_convs):
                c = nn.relu(bns_cls[lvl][i](convs_cls[i](c)))
                r = nn.relu(bns_reg[lvl][i](convs_reg[i](r)))
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r).astype(jnp.float32))
        return cls_out, reg_out


@dataclass(frozen=True)
class RetinaTrainConfig:
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_weight: float = 1.0
    bbox_weight: float = 1.0
    pad_divisor: int = 32
    # 'focal' (FocalLoss/L1, retinanet_r50_fpn_1x) or 'ghm'
    # (GHM-C/GHM-R, reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:
    # GHMC bins=30, GHMR mu=0.02 bins=10 loss_weight=10)
    loss_type: str = 'focal'
    ghm_c_bins: int = 30
    ghm_r_bins: int = 10
    ghm_mu: float = 0.02


@flax.struct.dataclass
class RetinaTargets:
    labels: jnp.ndarray
    label_weights: jnp.ndarray
    bbox_targets: jnp.ndarray   # encoded deltas
    pos_mask: jnp.ndarray
    num_pos: jnp.ndarray


def retina_targets(ctx: AnchorContext, gt, img_shapes, num_classes,
                   coder: DeltaXYWHBBoxCoder,
                   cfg: RetinaTrainConfig = RetinaTrainConfig(),
                   num_base_anchors=9):
    anchors = jnp.asarray(ctx.anchors)

    def single(gt_b, gt_l, gt_m, shape):
        pad_shape = jnp.ceil(shape / cfg.pad_divisor) * cfg.pad_divisor
        vf = valid_flags_jax(ctx.featmap_sizes, ctx.strides, pad_shape,
                             num_base_anchors=num_base_anchors)
        res = max_iou_assign(anchors, gt_b, gt_l, gt_m,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou, valid_flags=vf)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        ignore = res.labels == -2
        lw = vf.astype(jnp.float32) * (1.0 - ignore.astype(jnp.float32))
        deltas = coder.encode(anchors, gt_b[res.gt_idx])
        deltas = jnp.where(res.pos_mask[:, None], deltas, 0.0)
        return labels, lw, deltas, res.pos_mask

    labels, lw, bt, pos = jax.vmap(single)(gt.bboxes, gt.labels, gt.mask,
                                           img_shapes)
    return RetinaTargets(labels=labels, label_weights=lw, bbox_targets=bt,
                         pos_mask=pos,
                         num_pos=pos.sum().astype(jnp.float32))


def retina_loss(cls_scores, bbox_preds, targets: RetinaTargets,
                cfg: RetinaTrainConfig = RetinaTrainConfig()):
    """cls_scores (B, N, C) logits; bbox_preds (B, N, 4) deltas."""
    b, n, c = cls_scores.shape
    avg = jnp.maximum(targets.num_pos, 1.0)
    if cfg.loss_type == 'ghm':
        # GHM-C/GHM-R protocol (reference ghm_loss.py): one-hot targets
        # over ALL valid anchors, both losses normalized by the valid
        # count inside the ghm_* reductions (not by num_pos)
        from ...losses import ghm_c_loss, ghm_r_loss
        labels = targets.labels.reshape(-1)
        onehot = jax.nn.one_hot(labels, c, dtype=cls_scores.dtype)
        lw = jnp.broadcast_to(targets.label_weights.reshape(-1)[:, None],
                              (b * n, c))
        loss_cls = cfg.cls_weight * ghm_c_loss(
            cls_scores.reshape(-1, c), onehot, lw, bins=cfg.ghm_c_bins)
        wb = (targets.pos_mask.astype(jnp.float32) *
              targets.label_weights)[..., None]
        loss_bbox = cfg.bbox_weight * ghm_r_loss(
            bbox_preds.reshape(-1, 4), targets.bbox_targets.reshape(-1, 4),
            jnp.broadcast_to(wb, bbox_preds.shape).reshape(-1, 4),
            mu=cfg.ghm_mu, bins=cfg.ghm_r_bins)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
    loss_cls = cfg.cls_weight * sigmoid_focal_loss(
        cls_scores.reshape(-1, c), targets.labels.reshape(-1),
        weight=targets.label_weights.reshape(-1), gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha, avg_factor=avg)
    wb = (targets.pos_mask.astype(jnp.float32) *
          targets.label_weights)[..., None]
    loss_bbox = cfg.bbox_weight * l1_loss(
        bbox_preds, targets.bbox_targets,
        weight=jnp.broadcast_to(wb, bbox_preds.shape), avg_factor=avg)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def retina_predict(ctx: AnchorContext, cls_scores_lvl, bbox_preds_lvl, meta,
                   coder: DeltaXYWHBBoxCoder,
                   cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                   num_classes=80, rescale=True) -> DetResults:
    b = cls_scores_lvl[0].shape[0]
    anchors_np = ctx.anchors
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_lvls, reg_lvls, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_lvls)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(
                cls_lvls[lvl].reshape(n_l, num_classes))
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(anchors_np[slices[lvl]:slices[lvl + 1]])
            deltas = reg_lvls[lvl].reshape(n_l, 4)[top_idx]
            boxes = coder.decode(pri[top_idx], deltas, max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s)
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

    cls_by_lvl = [m.reshape(b, -1, num_classes) for m in cls_scores_lvl]
    reg_by_lvl = [m.reshape(b, -1, 4) for m in bbox_preds_lvl]
    return jax.vmap(single)(cls_by_lvl, reg_by_lvl, meta.img_shape,
                            meta.scale_factor)
