"""FCOS dense head (anchor-free, centerness), TPU-native.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/fcos_head.py
defaults: GN conv towers, per-level Scale + exp on the 4 distance outputs,
centerness branch on the cls tower, per-level regress ranges with min-area
gt resolution, FocalLoss + log-IoU (centerness-weighted) + BCE centerness.
The per-point target assignment is a dense (P, G) computation under vmap.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (binary_cross_entropy_with_logits, iou_loss,
                       sigmoid_focal_loss)
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults, distance2bbox
from ...structures.boxes import scale_boxes
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad
from .gfl_head import GFLTestConfig

INF = 1e8
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
STRIDES = (8, 16, 32, 64, 128)


class FCOSHeadNet(nn.Module):
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
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_centerness = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='conv_centerness')
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
            cls_out.append(conv_cls(cf))
            ctr_out.append(conv_centerness(cf))
            reg_out.append(
                jnp.exp(scales[lvl](conv_reg(rf)).astype(jnp.float32)))
        return cls_out, reg_out, ctr_out


@dataclass(frozen=True)
class FCOSPointContext:
    """Static per-bucket point grid with per-point stride and regress range."""
    image_shape: Tuple[int, int]
    featmap_sizes: Tuple[Tuple[int, int], ...]
    num_level_points: Tuple[int, ...]
    points: np.ndarray        # (P, 2)
    strides: np.ndarray       # (P,)
    ranges: np.ndarray        # (P, 2)

    @staticmethod
    def build(image_shape):
        import math
        sizes = [(math.ceil(image_shape[0] / s),
                  math.ceil(image_shape[1] / s)) for s in STRIDES]
        pts, strides, ranges, counts = [], [], [], []
        for (h, w), s, rng in zip(sizes, STRIDES, REGRESS_RANGES):
            xs = (np.arange(w, dtype=np.float32) + 0.5) * s
            ys = (np.arange(h, dtype=np.float32) + 0.5) * s
            gx, gy = np.meshgrid(xs, ys)
            p = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            pts.append(p)
            strides.append(np.full(len(p), s, np.float32))
            ranges.append(np.tile(np.asarray(rng, np.float32), (len(p), 1)))
            counts.append(len(p))
        return FCOSPointContext(
            image_shape=tuple(image_shape), featmap_sizes=tuple(sizes),
            num_level_points=tuple(counts), points=np.concatenate(pts),
            strides=np.concatenate(strides), ranges=np.concatenate(ranges))


@flax.struct.dataclass
class FCOSTargets:
    labels: jnp.ndarray        # (B, P)
    bbox_targets: jnp.ndarray  # (B, P, 4) l,t,r,b
    pos_mask: jnp.ndarray      # (B, P)
    num_pos: jnp.ndarray


def fcos_targets(ctx: FCOSPointContext, gt, num_classes):
    points = jnp.asarray(ctx.points)
    ranges = jnp.asarray(ctx.ranges)

    def single(gt_b, gt_l, gt_m):
        # (P, G) side distances
        l_ = points[:, None, 0] - gt_b[None, :, 0]
        t_ = points[:, None, 1] - gt_b[None, :, 1]
        r_ = gt_b[None, :, 2] - points[:, None, 0]
        b_ = gt_b[None, :, 3] - points[:, None, 1]
        ltrb = jnp.stack([l_, t_, r_, b_], axis=-1)  # (P, G, 4)
        inside = ltrb.min(axis=-1) > 0
        max_dist = ltrb.max(axis=-1)
        in_range = (max_dist >= ranges[:, None, 0]) & \
                   (max_dist <= ranges[:, None, 1])
        areas = (gt_b[:, 2] - gt_b[:, 0]) * (gt_b[:, 3] - gt_b[:, 1])
        cand = inside & in_range & gt_m[None, :]
        areas_b = jnp.where(cand, areas[None, :], INF)
        min_area = areas_b.min(axis=1)
        gidx = areas_b.argmin(axis=1)
        pos = min_area < INF
        labels = jnp.where(pos, gt_l[gidx], num_classes)
        p_idx = jnp.arange(points.shape[0])
        bbox_t = ltrb[p_idx, gidx]
        return labels.astype(jnp.int32), bbox_t, pos

    labels, bt, pos = jax.vmap(single)(gt.bboxes, gt.labels, gt.mask)
    return FCOSTargets(labels=labels, bbox_targets=bt, pos_mask=pos,
                       num_pos=pos.sum().astype(jnp.float32))


def centerness_target(ltrb):
    l_, t_, r_, b_ = (ltrb[..., 0], ltrb[..., 1], ltrb[..., 2],
                      ltrb[..., 3])
    eps = 1e-12
    lr = jnp.minimum(l_, r_) / jnp.maximum(jnp.maximum(l_, r_), eps)
    tb = jnp.minimum(t_, b_) / jnp.maximum(jnp.maximum(t_, b_), eps)
    return jnp.sqrt(jnp.clip(lr * tb, 0.0, None))


def fcos_loss(ctx: FCOSPointContext, cls_scores, bbox_preds, centernesses,
              targets: FCOSTargets, num_classes,
              focal_gamma=2.0, focal_alpha=0.25, cls_weight=1.0,
              bbox_weight=1.0, centerness_weight=1.0):
    """cls (B,P,C) logits; bbox (B,P,4) exp-distances; centerness (B,P)."""
    b, p, c = cls_scores.shape
    pos = targets.pos_mask
    num_pos = jnp.maximum(targets.num_pos, 1.0)

    loss_cls = cls_weight * sigmoid_focal_loss(
        cls_scores.reshape(-1, c), targets.labels.reshape(-1),
        gamma=focal_gamma, alpha=focal_alpha, avg_factor=num_pos)

    points = jnp.asarray(ctx.points)[None]
    decoded = distance2bbox(points, bbox_preds)
    decoded_t = distance2bbox(points, targets.bbox_targets)
    ctr_t = jnp.where(pos, centerness_target(targets.bbox_targets), 0.0)
    denom = jnp.maximum(ctr_t.sum(), 1e-6)
    lb = iou_loss(decoded.reshape(-1, 4), decoded_t.reshape(-1, 4),
                  mode='log', reduction='none')
    loss_bbox = bbox_weight * (lb * ctr_t.reshape(-1)).sum() / denom

    ctr_bce = binary_cross_entropy_with_logits(centernesses, ctr_t)
    loss_centerness = centerness_weight * \
        (ctr_bce * pos).sum() / num_pos
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_centerness=loss_centerness)


def fcos_predict(ctx: FCOSPointContext, cls_lvl, reg_lvl, ctr_lvl, meta,
                 cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                 num_classes=80, rescale=True) -> DetResults:
    b = cls_lvl[0].shape[0]
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_points)])

    def single(cls_by_lvl, reg_by_lvl, ctr_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_points[lvl]
            scores = jax.nn.sigmoid(cls_by_lvl[lvl])
            ctr = jax.nn.sigmoid(ctr_by_lvl[lvl][:, 0])
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pts = jnp.asarray(ctx.points[slices[lvl]:slices[lvl + 1]])
            boxes = distance2bbox(pts[top_idx], reg_by_lvl[lvl][top_idx],
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
