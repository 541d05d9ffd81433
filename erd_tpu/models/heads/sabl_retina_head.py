"""Side-Aware Boundary Localization (SABL) RetinaNet head, TPU-native.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/sabl_retina_head.py +
configs/sabl/sabl-retinanet_r50_fpn_1x_coco.py: one square prior per cell
(scale 4), assigned by ApproxMaxIoUAssigner (max IoU over the location's
9 octave approx anchors, pos 0.5 / neg 0.4, allowed_border=-1), localized
by the BucketingBBoxCoder (14 buckets, scale_factor 3: per-side bucket
classification + fine offset). Losses: FocalLoss on classes averaged by
pos+neg count (PseudoSampler avg_factor, sampling_result.py:99-100),
sigmoid-CE on bucket labels (avg*4*side, weight 1.5) and SmoothL1
(beta=1/9) on bucket offsets (avg*4*offset_topk, weight 1.5)
(sabl_retina_head.py:464-491). Prediction decodes buckets per level and
multiplies the mean bucket confidence into the scores before NMS
(sabl_retina_head.py:685-698 + base_dense_head._bbox_post_process).

TPU deltas: dense masked targets over ALL squares (no gather/unmap),
vmapped per-image assignment, static per-level top-k prediction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (binary_cross_entropy_loss, sigmoid_focal_loss,
                       smooth_l1_loss)
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task import AnchorGenerator
from ...task.bucketing import BucketingBBoxCoder
from ...task.max_iou import max_iou_assign
from ..layers import bias_init_prob, torch_pad
from .gfl_head import AnchorContext, GFLTestConfig


def sabl_approx_generator():
    """9 approx anchors/cell — the assignment-only generator."""
    return AnchorGenerator(strides=(8, 16, 32, 64, 128),
                           ratios=(0.5, 1.0, 2.0), octave_base_scale=4,
                           scales_per_octave=3)


def sabl_square_generator():
    """1 square prior/cell (scale 4) — the prediction prior."""
    return AnchorGenerator(strides=(8, 16, 32, 64, 128), ratios=(1.0,),
                           scales=(4.0,))


class SABLRetinaHeadNet(nn.Module):
    """4-conv cls/reg towers; C cls + side*4 bucket-cls + side*4
    bucket-offset convs (one square anchor per location)."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_buckets: int = 14
    use_gn: bool = False  # sabl-retinanet_*-gn configs: GN(32) towers

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        side = (self.num_buckets + 1) // 2
        convs_cls = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    use_bias=not self.use_gn,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        convs_reg = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    use_bias=not self.use_gn,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        if self.use_gn:
            gn_cls = [nn.GroupNorm(num_groups=32, name=f'cls_gn_{i}')
                      for i in range(self.stacked_convs)]
            gn_reg = [nn.GroupNorm(num_groups=32, name=f'reg_gn_{i}')
                      for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(self.num_classes, (3, 3),
                             padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=bias_init_prob(0.01),
                             name='retina_cls')
        retina_bbox_cls = nn.Conv(side * 4, (3, 3),
                                  padding=[torch_pad(3)] * 2,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='retina_bbox_cls')
        retina_bbox_reg = nn.Conv(side * 4, (3, 3),
                                  padding=[torch_pad(3)] * 2,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='retina_bbox_reg')
        cls_out, bcls_out, breg_out = [], [], []
        for x in feats:
            c = x
            r = x
            for i in range(self.stacked_convs):
                c = convs_cls[i](c)
                r = convs_reg[i](r)
                if self.use_gn:
                    c = gn_cls[i](c)
                    r = gn_reg[i](r)
                c = nn.relu(c)
                r = nn.relu(r)
            cls_out.append(retina_cls(c))
            bcls_out.append(retina_bbox_cls(r).astype(jnp.float32))
            breg_out.append(retina_bbox_reg(r).astype(jnp.float32))
        return cls_out, bcls_out, breg_out


@dataclass(frozen=True)
class SABLTrainConfig:
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_weight: float = 1.0
    bbox_cls_weight: float = 1.5
    bbox_reg_weight: float = 1.5
    smooth_l1_beta: float = 1.0 / 9.0


@flax.struct.dataclass
class SABLTargets:
    labels: jnp.ndarray          # (B, N) int
    label_weights: jnp.ndarray   # (B, N)
    bucket_labels: jnp.ndarray   # (B, N, 4*side) one-hot targets
    bucket_cls_w: jnp.ndarray    # (B, N, 4*side)
    bucket_offsets: jnp.ndarray  # (B, N, 4*side)
    bucket_off_w: jnp.ndarray    # (B, N, 4*side)
    avg_factor: jnp.ndarray      # scalar: total pos+neg over the batch


def sabl_targets(squares, approxs, gt, num_classes,
                 coder: BucketingBBoxCoder,
                 cfg: SABLTrainConfig = SABLTrainConfig()) -> SABLTargets:
    """squares (N, 4); approxs (N*A, 4) location-major (A consecutive
    approxs per square, matching get_sampled_approxs'
    view(num_square, approxs_per_octave, 4))."""
    squares = jnp.asarray(squares)
    approxs = jnp.asarray(approxs)
    n = squares.shape[0]
    a = approxs.shape[0] // n

    def single(gt_b, gt_l, gt_m):
        ov = bbox_overlaps(approxs, gt_b).reshape(n, a, -1).max(axis=1)
        res = max_iou_assign(None, gt_b, gt_l, gt_m,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou, overlaps=ov)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        ignore = res.labels == -2
        lw = 1.0 - ignore.astype(jnp.float32)
        offs, ow, blab, bcw = coder.encode(squares, gt_b[res.gt_idx])
        pos = res.pos_mask[:, None].astype(jnp.float32)
        num_sampled = (~ignore).sum()  # PseudoSampler pos+neg count
        return (labels, lw, blab * pos, bcw * pos, offs * pos, ow * pos,
                num_sampled)

    labels, lw, blab, bcw, offs, ow, ns = jax.vmap(single)(
        gt.bboxes, gt.labels, gt.mask)
    return SABLTargets(labels=labels, label_weights=lw, bucket_labels=blab,
                       bucket_cls_w=bcw, bucket_offsets=offs,
                       bucket_off_w=ow,
                       avg_factor=ns.sum().astype(jnp.float32))


def sabl_loss(cls_flat, bcls_flat, breg_flat, targets: SABLTargets,
              coder: BucketingBBoxCoder,
              cfg: SABLTrainConfig = SABLTrainConfig()):
    """cls (B, N, C) logits; bcls/breg (B, N, 4*side)."""
    b, n, c = cls_flat.shape
    side = bcls_flat.shape[-1] // 4
    avg = jnp.maximum(targets.avg_factor, 1.0)
    loss_cls = cfg.cls_weight * sigmoid_focal_loss(
        cls_flat.reshape(-1, c), targets.labels.reshape(-1),
        weight=targets.label_weights.reshape(-1), gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha, avg_factor=avg)
    loss_bbox_cls = cfg.bbox_cls_weight * binary_cross_entropy_loss(
        bcls_flat.reshape(-1, 4 * side),
        targets.bucket_labels.reshape(-1, 4 * side),
        weight=targets.bucket_cls_w.reshape(-1, 4 * side),
        avg_factor=avg * 4 * side)
    loss_bbox_reg = cfg.bbox_reg_weight * smooth_l1_loss(
        breg_flat.reshape(-1, 4 * side),
        targets.bucket_offsets.reshape(-1, 4 * side),
        weight=targets.bucket_off_w.reshape(-1, 4 * side),
        beta=cfg.smooth_l1_beta, avg_factor=avg * 4 * coder.offset_topk)
    return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bbox_cls,
                loss_bbox_reg=loss_bbox_reg)


def sabl_predict(ctx: AnchorContext, cls_lvl, bcls_lvl, breg_lvl, meta,
                 coder: BucketingBBoxCoder,
                 cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                 num_classes=80, rescale=True) -> DetResults:
    b = cls_lvl[0].shape[0]
    side = (coder.num_buckets + 1) // 2
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_lvls, bcls_lvls, breg_lvls, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_lvls)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(cls_lvls[lvl].reshape(n_l, num_classes))
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(ctx.anchors[slices[lvl]:slices[lvl + 1]])
            boxes, confids = coder.decode(
                pri[top_idx],
                bcls_lvls[lvl].reshape(n_l, 4 * side)[top_idx],
                breg_lvls[lvl].reshape(n_l, 4 * side)[top_idx],
                max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s * confids)
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

    cls_by_lvl = [m.reshape(b, -1, num_classes) for m in cls_lvl]
    bcls_by_lvl = [m.reshape(b, -1, 4 * side) for m in bcls_lvl]
    breg_by_lvl = [m.reshape(b, -1, 4 * side) for m in breg_lvl]
    return jax.vmap(single)(cls_by_lvl, bcls_by_lvl, breg_by_lvl,
                            meta.img_shape, meta.scale_factor)
