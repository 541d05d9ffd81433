"""FoveaBox dense head (fovea-area assignment, log-space side regression).

Behavioural mirror of /root/reference/mmdet/models/dense_heads/fovea_head.py
+ configs/foveabox/fovea_r50_fpn_4xb4-1x_coco.py (with_deform=False):
per-level scale assignment by sqrt(gt area) against ``scale_ranges``, the
positive "fovea" is the sigma-shrunk gt painted in feature-cell coordinates
(:333-384, larger gts painted first so the smallest hit wins), targets are
log((side distance)/base_len) clamped to [1/16, 16], FocalLoss(gamma=1.5,
alpha=0.4, avg=num_pos+num_imgs) + SmoothL1(beta=0.11, avg=num_pos), decode
exp(pred)*base_len around the cell center clamped to [0, size-1] (:481-509).
Painting loops become a dense (P, G) min-area resolution under vmap.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ..layers import ConvModule, bias_init_prob, torch_pad
from .fcos_head import FCOSPointContext
from .gfl_head import GFLTestConfig

import flax.linen as nn

INF = 1e8
STRIDES = (8, 16, 32, 64, 128)
BASE_EDGES = (16, 32, 64, 128, 256)
SCALE_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))


class FoveaHeadNet(nn.Module):
    """4 GN-free conv towers (AnchorFreeHead default has GN=None? the fovea
    config uses plain convs: norm_cfg unset -> conv+relu), cls and reg
    heads; no scales, raw (pre-exp) reg output."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats):
        cls_convs = [ConvModule(self.feat_channels, 3, norm=None,
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=None,
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        cls_out, reg_out = [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            cls_out.append(conv_cls(cf))
            reg_out.append(conv_reg(rf).astype(jnp.float32))
        return cls_out, reg_out


def fovea_point_context(image_shape) -> FCOSPointContext:
    return FCOSPointContext.build(image_shape)


@flax.struct.dataclass
class FoveaTargets:
    labels: jnp.ndarray        # (B, P)
    bbox_targets: jnp.ndarray  # (B, P, 4) log-space
    pos_mask: jnp.ndarray      # (B, P)
    num_pos: jnp.ndarray


def fovea_targets(ctx: FCOSPointContext, gt, num_classes,
                  sigma=0.4):
    """Dense fovea assignment over the flattened point axis."""
    points = jnp.asarray(ctx.points)          # (P, 2)
    strides = jnp.asarray(ctx.strides)        # (P,)
    base_len = jnp.asarray(np.repeat(
        np.asarray(BASE_EDGES, np.float32), ctx.num_level_points))
    lo = jnp.asarray(np.repeat(
        np.asarray([r[0] for r in SCALE_RANGES], np.float32),
        ctx.num_level_points))
    hi = jnp.asarray(np.repeat(
        np.asarray([r[1] for r in SCALE_RANGES], np.float32),
        ctx.num_level_points))
    # per-level featmap extents, repeated per point (for the clamp)
    wmax = jnp.asarray(np.repeat(
        np.asarray([s[1] - 1 for s in ctx.featmap_sizes], np.float32),
        ctx.num_level_points))
    hmax = jnp.asarray(np.repeat(
        np.asarray([s[0] - 1 for s in ctx.featmap_sizes], np.float32),
        ctx.num_level_points))

    def single(gt_b, gt_l, gt_m):
        g_sqrt = jnp.sqrt(jnp.clip(
            (gt_b[:, 2] - gt_b[:, 0]) * (gt_b[:, 3] - gt_b[:, 1]), 0, None))
        # (P, G) scale-range hit
        hit = (g_sqrt[None, :] >= lo[:, None]) & \
              (g_sqrt[None, :] <= hi[:, None]) & gt_m[None, :]
        # gt in feature coords of each point's level
        s = strides[:, None]
        gx1, gy1 = gt_b[None, :, 0] / s, gt_b[None, :, 1] / s
        gx2, gy2 = gt_b[None, :, 2] / s, gt_b[None, :, 3] / s
        half_w = 0.5 * (gx2 - gx1)
        half_h = 0.5 * (gy2 - gy1)
        px1 = jnp.clip(jnp.ceil(gx1 + (1 - sigma) * half_w - 0.5),
                       0, wmax[:, None])
        px2 = jnp.clip(jnp.floor(gx1 + (1 + sigma) * half_w - 0.5),
                       0, wmax[:, None])
        py1 = jnp.clip(jnp.ceil(gy1 + (1 - sigma) * half_h - 0.5),
                       0, hmax[:, None])
        py2 = jnp.clip(jnp.floor(gy1 + (1 + sigma) * half_h - 0.5),
                       0, hmax[:, None])
        # cell index of each point at its level
        ci = points[:, 0] / strides - 0.5
        cj = points[:, 1] / strides - 0.5
        in_fovea = ((ci[:, None] >= px1 - 0.5) & (ci[:, None] <= px2 + 0.5) &
                    (cj[:, None] >= py1 - 0.5) & (cj[:, None] <= py2 + 0.5))
        cand = hit & in_fovea
        areas = g_sqrt ** 2
        # smallest-area gt wins (painted last in the reference :349-350)
        areas_m = jnp.where(cand, areas[None, :], INF)
        gidx = areas_m.argmin(axis=1)
        pos = areas_m.min(axis=1) < INF
        labels = jnp.where(pos, gt_l[gidx], num_classes).astype(jnp.int32)
        gsel = gt_b[gidx]
        bl = base_len
        t = jnp.stack([(points[:, 0] - gsel[:, 0]) / bl,
                       (points[:, 1] - gsel[:, 1]) / bl,
                       (gsel[:, 2] - points[:, 0]) / bl,
                       (gsel[:, 3] - points[:, 1]) / bl], axis=-1)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        t = jnp.where(pos[:, None], t, 0.0)
        return labels, t, pos

    labels, bt, pos = jax.vmap(single)(gt.bboxes, gt.labels, gt.mask)
    return FoveaTargets(labels=labels, bbox_targets=bt, pos_mask=pos,
                        num_pos=pos.sum().astype(jnp.float32))


def fovea_loss(cls_scores, bbox_preds, targets: FoveaTargets, num_classes,
               focal_gamma=1.5, focal_alpha=0.4, smooth_l1_beta=0.11,
               bbox_weight=1.0):
    """cls (B,P,C) logits; bbox (B,P,4) raw (log-space) predictions."""
    b, p, c = cls_scores.shape
    num_pos = targets.num_pos
    loss_cls = sigmoid_focal_loss(
        cls_scores.reshape(-1, c), targets.labels.reshape(-1),
        gamma=focal_gamma, alpha=focal_alpha,
        avg_factor=num_pos + b)
    el = smooth_l1_loss(bbox_preds, targets.bbox_targets,
                        beta=smooth_l1_beta, reduction='none')
    el = el * targets.pos_mask[..., None]
    loss_bbox = bbox_weight * el.sum() / jnp.maximum(num_pos, 1.0)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def fovea_predict(ctx: FCOSPointContext, cls_lvl, reg_lvl, meta,
                  cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                  num_classes=80, rescale=True) -> DetResults:
    b = cls_lvl[0].shape[0]
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_points)])

    def single(cls_by_lvl, reg_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_points[lvl]
            base_len = float(BASE_EDGES[lvl])
            scores = jax.nn.sigmoid(cls_by_lvl[lvl])
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pts = jnp.asarray(ctx.points[slices[lvl]:slices[lvl + 1]])
            sel_p = pts[top_idx]
            e = jnp.exp(reg_by_lvl[lvl][top_idx])
            x1 = jnp.clip(sel_p[:, 0] - base_len * e[:, 0],
                          0, img_shape[1] - 1)
            y1 = jnp.clip(sel_p[:, 1] - base_len * e[:, 1],
                          0, img_shape[0] - 1)
            x2 = jnp.clip(sel_p[:, 0] + base_len * e[:, 2],
                          0, img_shape[1] - 1)
            y2 = jnp.clip(sel_p[:, 1] + base_len * e[:, 3],
                          0, img_shape[0] - 1)
            boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
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

    cls_b = [m.reshape(b, -1, num_classes) for m in cls_lvl]
    reg_b = [m.reshape(b, -1, 4) for m in reg_lvl]
    return jax.vmap(single)(cls_b, reg_b, meta.img_shape, meta.scale_factor)
