"""RepPoints dense head (point-set representation, moment transform).

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/reppoints_head.py +
configs/reppoints/reppoints-moment_r50_fpn_1x_coco.py (center_init,
moment transform, 9 points): 3 plain conv towers; an init points branch
(3x3 conv -> 1x1 -> 18ch y-first offsets); a 3x3 *deformable* cls conv and
refine conv whose offsets are the gradient-gated init points minus the DCN
base grid (:280-325); points -> box via the moment transform with the
learnable, gradient-gated ``moment_transfer`` (:221-239). Init targets from
PointAssigner(scale=4, pos_num=1), refine targets from MaxIoU(0.5/0.4) on
boxes decoded from the detached init points (:696-741); losses are
FocalLoss (avg = refine positives) + SmoothL1(beta=0.11) on boxes
normalized by ``point_base_scale * stride`` (w 0.5 init / 1.0 refine).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...ops.deform_conv import deform_conv2d
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task.max_iou import max_iou_assign
from ...task.point_assigner import point_assign
from ..layers import ConvModule, bias_init_prob, torch_pad
from .fcos_head import FCOSPointContext
from .gfl_head import GFLTestConfig

NUM_POINTS = 9
POINT_BASE_SCALE = 4
GRADIENT_MUL = 0.1
MOMENT_MUL = 0.01
STRIDES = (8, 16, 32, 64, 128)


def _dcn_base_offset():
    """(9, 2) y-first base grid of a 3x3 kernel (reference :117-127)."""
    ky, kx = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing='ij')
    return np.stack([ky.reshape(-1), kx.reshape(-1)], axis=-1) \
        .astype(np.float32)


class _DeformHeadConv(nn.Module):
    """3x3 deform conv with externally supplied (dy, dx) offsets."""
    features: int

    @nn.compact
    def __call__(self, x, offsets):
        # x (B, H, W, C); offsets (B, H, W, 9, 2) y-first absolute deltas
        weight = self.param('kernel', nn.initializers.normal(0.01),
                            (3, 3, x.shape[-1], self.features), jnp.float32)

        def single(xi, oi):
            return deform_conv2d(xi.astype(jnp.float32),
                                 oi[:, :, None], weight,
                                 stride=1, padding=1, deform_groups=1)

        return jax.vmap(single)(x, offsets)


class RepPointsHeadNet(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [ConvModule(self.feat_channels, 3, norm=None,
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=None,
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                kernel_init=nn.initializers.normal(0.01),
                                name='pts_init_conv')
        pts_init_out = nn.Conv(2 * NUM_POINTS, (1, 1),
                               kernel_init=nn.initializers.normal(0.01),
                               name='pts_init_out')
        cls_dconv = _DeformHeadConv(self.point_feat_channels,
                                    name='cls_dconv')
        cls_out_conv = nn.Conv(self.num_classes, (1, 1),
                               kernel_init=nn.initializers.normal(0.01),
                               bias_init=bias_init_prob(0.01),
                               name='cls_out')
        refine_dconv = _DeformHeadConv(self.point_feat_channels,
                                       name='refine_dconv')
        refine_out_conv = nn.Conv(2 * NUM_POINTS, (1, 1),
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='refine_out')
        base_off = jnp.asarray(_dcn_base_offset())  # (9, 2)

        cls_scores, pts_inits, pts_refines = [], [], []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            pts_init = pts_init_out(
                nn.relu(pts_init_conv(rf))).astype(jnp.float32)
            # gradient-gated offsets for the deformable convs (:316-318)
            pts_gm = (1 - GRADIENT_MUL) * jax.lax.stop_gradient(pts_init) \
                + GRADIENT_MUL * pts_init
            b, h, w, _ = pts_gm.shape
            dcn_off = pts_gm.reshape(b, h, w, NUM_POINTS, 2) - base_off
            cls_scores.append(
                cls_out_conv(nn.relu(cls_dconv(cf, dcn_off)))
                .astype(jnp.float32))
            pts_refine = refine_out_conv(
                nn.relu(refine_dconv(rf, dcn_off))).astype(jnp.float32)
            pts_refines.append(pts_refine +
                               jax.lax.stop_gradient(pts_init))
            pts_inits.append(pts_init)
        # learnable moment transfer shared across levels (:101-104)
        moment = self.param('moment_transfer', nn.initializers.zeros,
                            (2,), jnp.float32)
        return cls_scores, pts_inits, pts_refines, moment


def points2bbox(pts, moment):
    """pts (..., 18) y-first offsets -> (..., 4) box via moment transform.

    moment is the learnable (2,) [width, height] log-half-size transfer,
    gradient-gated by MOMENT_MUL (reference :221-239).
    """
    p = pts.reshape(pts.shape[:-1] + (NUM_POINTS, 2))
    py, px = p[..., 0], p[..., 1]
    my = py.mean(axis=-1, keepdims=True)
    mx = px.mean(axis=-1, keepdims=True)
    # torch.std defaults to the unbiased (ddof=1) estimator
    sy = jnp.std(py - my, axis=-1, keepdims=True, ddof=1)
    sx = jnp.std(px - mx, axis=-1, keepdims=True, ddof=1)
    mt = moment * MOMENT_MUL + jax.lax.stop_gradient(moment) * \
        (1 - MOMENT_MUL)
    half_w = sx * jnp.exp(mt[0])
    half_h = sy * jnp.exp(mt[1])
    return jnp.concatenate([mx - half_w, my - half_h,
                            mx + half_w, my + half_h], axis=-1)


@flax.struct.dataclass
class RepPointsTargets:
    labels: jnp.ndarray          # (B, P) refine-stage labels
    gt_init: jnp.ndarray         # (B, P, 4)
    w_init: jnp.ndarray          # (B, P)
    gt_refine: jnp.ndarray       # (B, P, 4)
    w_refine: jnp.ndarray        # (B, P)
    num_pos_init: jnp.ndarray
    num_pos_refine: jnp.ndarray


def reppoints_targets(ctx: FCOSPointContext, init_boxes, gt, num_classes):
    """init_boxes (B, P, 4): boxes decoded from detached init points."""
    points = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)

    def single(init_b, gt_b, gt_l, gt_m):
        init_res = point_assign(points, strides, gt_b, gt_l, gt_m,
                                scale=POINT_BASE_SCALE, pos_num=1)
        ref_res = max_iou_assign(init_b, gt_b, gt_l, gt_m,
                                 pos_iou_thr=0.5, neg_iou_thr=0.4,
                                 min_pos_iou=0.0)
        labels = jnp.where(ref_res.pos_mask, ref_res.labels, num_classes)
        return (labels.astype(jnp.int32),
                gt_b[init_res.gt_idx], init_res.pos_mask,
                gt_b[ref_res.gt_idx], ref_res.pos_mask)

    labels, gi, wi, gr, wr = jax.vmap(single)(
        init_boxes, gt.bboxes, gt.labels, gt.mask)
    return RepPointsTargets(
        labels=labels, gt_init=gi, w_init=wi, gt_refine=gr, w_refine=wr,
        num_pos_init=wi.sum().astype(jnp.float32),
        num_pos_refine=wr.sum().astype(jnp.float32))


def pts_to_img_boxes(ctx: FCOSPointContext, pts_flat, moment):
    """(B, P, 18) offsets -> (B, P, 4) image-coord boxes: box(pts)*stride
    + center (reference offset_to_pts + loss normalization path)."""
    points = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)
    box = points2bbox(pts_flat, moment)
    ctr = jnp.concatenate([points, points], axis=-1)
    return box * strides[None, :, None] + ctr[None]


def reppoints_loss(ctx: FCOSPointContext, cls_flat, init_boxes, refine_boxes,
                   targets: RepPointsTargets, num_classes,
                   focal_gamma=2.0, focal_alpha=0.25,
                   beta=0.11, w_init=0.5, w_refine=1.0):
    """cls (B,P,C); init/refine_boxes (B,P,4) image coords (grad-carrying)."""
    b, p, c = cls_flat.shape
    norm = (jnp.asarray(ctx.strides) * POINT_BASE_SCALE)[None, :, None]
    avg_init = jnp.maximum(targets.num_pos_init, 1.0)
    avg_refine = jnp.maximum(targets.num_pos_refine, 1.0)

    loss_cls = sigmoid_focal_loss(
        cls_flat.reshape(-1, c), targets.labels.reshape(-1),
        gamma=focal_gamma, alpha=focal_alpha, avg_factor=avg_refine)

    li = smooth_l1_loss(init_boxes / norm, targets.gt_init / norm,
                        beta=beta,
                        reduction='none') * targets.w_init[..., None]
    lr = smooth_l1_loss(refine_boxes / norm, targets.gt_refine / norm,
                        beta=beta,
                        reduction='none') * targets.w_refine[..., None]
    return dict(loss_cls=loss_cls,
                loss_pts_init=w_init * li.sum() / avg_init,
                loss_pts_refine=w_refine * lr.sum() / avg_refine)


def reppoints_predict(ctx: FCOSPointContext, cls_lvl, boxes_flat, meta,
                      cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.5),
                      num_classes=80, rescale=True) -> DetResults:
    """cls per level; boxes_flat (B, P, 4) refined image-coord boxes."""
    b = cls_lvl[0].shape[0]
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_points)])

    def single(cls_by_lvl, boxes_i, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_points[lvl]
            scores = jax.nn.sigmoid(cls_by_lvl[lvl])
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            bl = boxes_i[slices[lvl]:slices[lvl + 1]][top_idx]
            h, w = img_shape[0], img_shape[1]
            bl = jnp.clip(bl, 0, jnp.stack([w, h, w, h]).astype(bl.dtype))
            boxes_all.append(bl)
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
    return jax.vmap(single)(cls_b, boxes_flat, meta.img_shape,
                            meta.scale_factor)
