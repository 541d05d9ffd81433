"""FSAF dense head (anchor-free branch with online feature selection).

Behavioural mirror of /root/reference/mmdet/models/dense_heads/fsaf_head.py
+ configs/fsaf/fsaf_r50_fpn_1x_coco.py: RetinaNet towers with ONE prior per
cell (a stride-sized square), relu'd TBLR outputs clamped at 1e-4,
CenterRegionAssigner(0.2/0.2) targets, per-element FocalLoss + decoded-box
log-IoU loss, then *online feature selection* (:278-340): each gt keeps its
positives only at the FPN level where its mean (cls+reg) loss is smallest;
demoted anchors keep their other-class cls gradients (only the gt-label
channel is zeroed, :430-444). Normalized by the surviving positive count
(:325-334). All selection logic is dense masked algebra over the flattened
(P,) anchor axis with a static per-anchor level id — no nonzero/argsort.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import binary_cross_entropy_with_logits, iou_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task import AnchorGenerator
from ...task.center_region import center_region_assign
from ...task.coder import TBLRBBoxCoder
from .gfl_head import AnchorContext, GFLTestConfig
from .retina_head import RetinaHeadNet


def fsaf_anchor_generator():
    """One square stride-sized prior per cell (fsaf config :15-20)."""
    return AnchorGenerator(strides=(8, 16, 32, 64, 128), ratios=(1.0,),
                           octave_base_scale=1, scales_per_octave=1)


class FSAFHeadNet(RetinaHeadNet):
    """Retina towers, 1 prior/cell; relu on the TBLR regression output
    (handled via RetinaHeadNet's ``reg_relu`` flag)."""
    num_base_anchors: int = 1
    reg_relu: bool = True
    reg_bias_init: float = 0.25


@dataclass(frozen=True)
class FSAFTrainConfig:
    pos_scale: float = 0.2
    neg_scale: float = 0.2
    min_pos_iof: float = 0.01
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_weight: float = 1.0
    bbox_weight: float = 1.0


@flax.struct.dataclass
class FSAFTargets:
    labels: jnp.ndarray        # (B, P)
    cls_weights: jnp.ndarray   # (B, P, C) shadow-aware per-class weights
    gt_idx: jnp.ndarray        # (B, P) assigned padded-gt index
    gt_boxes: jnp.ndarray      # (B, P, 4) assigned gt box (abs coords)
    pos_mask: jnp.ndarray      # (B, P)


def fsaf_targets(ctx: AnchorContext, gt, num_classes,
                 cfg: FSAFTrainConfig = FSAFTrainConfig()):
    anchors = jnp.asarray(ctx.anchors)

    def single(gt_b, gt_l, gt_m):
        res = center_region_assign(anchors, gt_b, gt_l, gt_m,
                                   cfg.pos_scale, cfg.neg_scale,
                                   cfg.min_pos_iof)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        # per-class weights: 1 everywhere except shadowed (anchor, label_g)
        shadow_cls = (res.shadow[..., None] *
                      jax.nn.one_hot(gt_l, num_classes)[None]).sum(1)
        cw = 1.0 - jnp.clip(shadow_cls, 0.0, 1.0)
        # positives always keep their own label channel
        own = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
        cw = jnp.where(res.pos_mask[:, None], jnp.maximum(cw, own), cw)
        return (labels.astype(jnp.int32), cw, res.gt_idx,
                gt_b[res.gt_idx], res.pos_mask)

    labels, cw, gi, gb, pos = jax.vmap(single)(gt.bboxes, gt.labels, gt.mask)
    return FSAFTargets(labels=labels, cls_weights=cw, gt_idx=gi,
                       gt_boxes=gb, pos_mask=pos)


def fsaf_loss(ctx: AnchorContext, cls_scores, bbox_preds,
              targets: FSAFTargets, gt_mask, num_classes,
              coder: TBLRBBoxCoder = None,
              cfg: FSAFTrainConfig = FSAFTrainConfig()):
    """cls (B,P,C) logits; bbox (B,P,4) relu'd TBLR. gt_mask (B,G)."""
    coder = coder or TBLRBBoxCoder(normalizer=4.0)
    b, p, c = cls_scores.shape
    g = gt_mask.shape[1]
    anchors = jnp.asarray(ctx.anchors)
    level_id = jnp.asarray(np.repeat(
        np.arange(len(ctx.num_level_anchors)), ctx.num_level_anchors))
    n_levels = len(ctx.num_level_anchors)
    pos = targets.pos_mask

    # element-wise focal loss (B, P, C); reference uses reduction='none'
    onehot = jax.nn.one_hot(targets.labels, num_classes + 1)[..., :c]
    prob = jax.nn.sigmoid(cls_scores)
    pt = (1 - prob) * onehot + prob * (1 - onehot)
    fw = (cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) *
          (1 - onehot)) * jnp.power(pt, cfg.focal_gamma)
    cls_el = binary_cross_entropy_with_logits(cls_scores, onehot) * fw
    cls_el = cls_el * targets.cls_weights

    # decoded-box IoU loss per anchor (avoid 0-area: clamp preds, :238-239)
    preds = jnp.clip(bbox_preds, 1e-4, None)
    decoded = coder.decode(anchors[None], preds)
    reg_el = iou_loss(decoded.reshape(-1, 4),
                      targets.gt_boxes.reshape(-1, 4),
                      mode='log', reduction='none').reshape(b, p)
    reg_el = jnp.where(pos, reg_el, 0.0)

    # online feature selection: mean (cls_sum + reg) loss of each gt at each
    # level among its positives; argmin level wins (:278-307)
    anchor_loss = cls_el.sum(-1) + reg_el                    # (B, P)
    onehot_gt = (jax.nn.one_hot(targets.gt_idx, g) *
                 pos[..., None])                             # (B, P, G)
    lvl_onehot = jax.nn.one_hot(level_id, n_levels)          # (P, L)
    # pair (B, P, G, L) contracted to (B, G, L)
    cnt = jnp.einsum('bpg,pl->bgl', onehot_gt, lvl_onehot)
    tot = jnp.einsum('bp,bpg,pl->bgl', anchor_loss, onehot_gt, lvl_onehot)
    mean_loss = jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 1e6)
    best_level = mean_loss.argmin(-1)                        # (B, G)

    keep = (jnp.take_along_axis(
        best_level, targets.gt_idx.reshape(b, p), axis=1) ==
        level_id[None]) & pos
    # demoted positives: zero reg; zero only the gt-label cls channel
    demoted = pos & ~keep
    own = jax.nn.one_hot(targets.labels, num_classes + 1)[..., :c]
    cls_el = jnp.where(demoted[..., None], cls_el * (1.0 - own), cls_el)
    reg_el = jnp.where(keep, reg_el, 0.0)

    num_pos = keep.sum().astype(jnp.float32)
    num_neg = (~pos).sum().astype(jnp.float32)
    avg = jnp.where(num_pos > 0, num_pos, num_pos + num_neg)
    avg = jnp.maximum(avg, 1.0)
    return dict(loss_cls=cfg.cls_weight * cls_el.sum() / avg,
                loss_bbox=cfg.bbox_weight * reg_el.sum() / avg)


def fsaf_predict(ctx: AnchorContext, cls_scores_lvl, bbox_preds_lvl, meta,
                 coder: TBLRBBoxCoder = None,
                 cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                 num_classes=80, rescale=True) -> DetResults:
    coder = coder or TBLRBBoxCoder(normalizer=4.0)
    b = cls_scores_lvl[0].shape[0]
    anchors_np = ctx.anchors
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_lvls, reg_lvls, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_lvls)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(cls_lvls[lvl].reshape(n_l, num_classes))
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(anchors_np[slices[lvl]:slices[lvl + 1]])
            tblr = reg_lvls[lvl].reshape(n_l, 4)[top_idx]
            boxes = coder.decode(pri[top_idx], tblr, max_shape=img_shape)
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
