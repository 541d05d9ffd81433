"""Guided Anchoring (GA) kit: location/shape prediction + feature
adaption + masked inference.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/guided_anchor_head.py (+
ga_rpn_head.py defaults): per level a 1x1 *loc* conv predicts anchor
existence (focal loss on center-region targets: the sigma_center(=0.25)
region of each gt at its scale-assigned level is positive and the
sigma_ignore(=0.5) ring is ignored, anchor_target's ga_loc_targets), a
1x1 *shape* conv predicts (dw, dh) with anchor wh = sigma * stride *
exp(d) (sigma=8 octave scale); a *feature adaption* deform conv whose
offsets derive from the shape prediction re-aligns the features; the
shape loss is the bounded-IoU of the predicted-shape anchor against the
best-matching gt (approximated over the 9 octave anchors,
ga_shape_targets); inference keeps only locations with loc prob >
loc_filter_thr — the mmcv MaskedConv2d path, realized with
ops.masked_conv2d semantics (dense conv x mask).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import bounded_iou_loss, sigmoid_focal_loss
from ...ops.deform_conv import deform_conv2d
from ...structures.boxes import bbox_overlaps
from ..layers import bias_init_prob, torch_pad

SIGMA_CENTER = 0.25
SIGMA_IGNORE = 0.5
OCTAVE_SCALE = 8.0


class GAFeatureAdaption(nn.Module):
    """1x1 on the (detached) shape pred -> 3x3 deform-conv offsets."""
    features: int

    @nn.compact
    def __call__(self, x, shape_pred):
        off = nn.Conv(9 * 2, (1, 1),
                      kernel_init=nn.initializers.normal(0.1),
                      use_bias=False, name='conv_offset')(
            jax.lax.stop_gradient(shape_pred)).astype(jnp.float32)
        b, h, w, _ = off.shape
        offsets = off.reshape(b, h, w, 9, 2)
        weight = self.param('kernel', nn.initializers.normal(0.01),
                            (3, 3, x.shape[-1], self.features),
                            jnp.float32)

        def single(xi, oi):
            return deform_conv2d(xi.astype(jnp.float32), oi[:, :, None],
                                 weight, stride=1, padding=1)

        return nn.relu(jax.vmap(single)(x, offsets))


class GARPNHeadNet(nn.Module):
    """GA-RPN: shared 3x3 conv, loc/shape branches, adapted cls/reg."""
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.feat_channels, (3, 3),
                       padding=[torch_pad(3)] * 2,
                       kernel_init=nn.initializers.normal(0.01),
                       name='rpn_conv')
        loc_conv = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01),
                           name='conv_loc')
        shape_conv = nn.Conv(2, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        adaption = GAFeatureAdaption(self.feat_channels,
                                     name='feature_adaption')
        cls_conv = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_cls')
        reg_conv = nn.Conv(4, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        locs, shapes, clss, regs = [], [], [], []
        for x in feats:
            y = nn.relu(conv(x))
            loc = loc_conv(y).astype(jnp.float32)
            shp = shape_conv(y).astype(jnp.float32)
            adapted = adaption(y, shp)
            locs.append(loc)
            shapes.append(shp)
            clss.append(cls_conv(adapted).astype(jnp.float32))
            regs.append(reg_conv(adapted).astype(jnp.float32))
        return locs, shapes, clss, regs


def ga_loc_targets(points, strides, num_level_points, gt_bboxes, gt_mask,
                   featmap_strides=(8, 16, 32, 64, 128)):
    """Dense (P,) loc labels: 1 positive, 0 negative, -1 ignore.

    Reference ga_loc_targets: each gt is routed to the level whose stride
    matches its scale (log2 of sqrt area / 8); the sigma_center box is
    positive there, the sigma_ignore box is ignored there AND the
    sigma_center region is ignored on the two adjacent levels.
    """
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
        (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1.0, None))
    target_lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / OCTAVE_SCALE / featmap_strides[0]
                           ) + 0.5),
        0, len(featmap_strides) - 1).astype(jnp.int32)
    lvl_of_point = jnp.asarray(np.repeat(
        np.arange(len(num_level_points)), num_level_points))

    def region(scale_f):
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
        hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * scale_f / 2
        hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * scale_f / 2
        inside = ((points[:, None, 0] >= (cx - hw)[None]) &
                  (points[:, None, 0] <= (cx + hw)[None]) &
                  (points[:, None, 1] >= (cy - hh)[None]) &
                  (points[:, None, 1] <= (cy + hh)[None]))
        return inside & gt_mask[None, :]

    in_center = region(SIGMA_CENTER)
    in_ignore = region(SIGMA_IGNORE)
    same_lvl = lvl_of_point[:, None] == target_lvl[None, :]
    adj_lvl = jnp.abs(lvl_of_point[:, None] - target_lvl[None, :]) == 1
    pos = (in_center & same_lvl).any(axis=1)
    ign = ((in_ignore & same_lvl) | (in_center & adj_lvl)).any(axis=1)
    labels = jnp.where(pos, 1, jnp.where(ign, -1, 0))
    return labels.astype(jnp.int32)


def ga_shape_targets(points, stride_per_point, gt_bboxes, gt_mask):
    """Best-gt assignment for the shape branch: each location's square
    approx anchor (octave scale * stride) max-IoU over gts; positions with
    IoU above 0 train toward their best gt (approximation of the
    reference's ApproxMaxIoU over 9 octave anchors)."""
    half = OCTAVE_SCALE * stride_per_point / 2
    approx = jnp.stack([points[:, 0] - half, points[:, 1] - half,
                        points[:, 0] + half, points[:, 1] + half], -1)
    iou = bbox_overlaps(approx, gt_bboxes)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = iou.argmax(axis=1)
    pos = iou.max(axis=1) > 0.3
    return best, pos


def ga_losses(points, strides, num_level_points, loc_flat, shape_flat,
              gt, loc_weight=1.0, shape_weight=0.2):
    """loc (B,P) logits; shape (B,P,2). Returns GA's loc+shape losses."""

    def single(loc_i, shp_i, gt_b, gt_m):
        labels = ga_loc_targets(points, strides, num_level_points, gt_b,
                                gt_m)
        w = (labels >= 0).astype(jnp.float32)
        n_pos = jnp.maximum((labels == 1).sum().astype(jnp.float32), 1.0)
        lloc = sigmoid_focal_loss(
            loc_i[:, None], jnp.where(labels == 1, 0, 1),
            weight=w, avg_factor=n_pos)
        best, pos = ga_shape_targets(points, strides, gt_b, gt_m)
        wh = OCTAVE_SCALE * strides[:, None] * jnp.exp(
            jnp.clip(shp_i, -8.0, 8.0))
        pred_boxes = jnp.stack(
            [points[:, 0] - wh[:, 0] / 2, points[:, 1] - wh[:, 1] / 2,
             points[:, 0] + wh[:, 0] / 2, points[:, 1] + wh[:, 1] / 2],
            -1)
        lb = bounded_iou_loss(pred_boxes, gt_b[best],
                              reduction='none').sum(-1)
        n_sp = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        lshape = (lb * pos).sum() / n_sp
        return lloc, lshape

    lloc, lshape = jax.vmap(single)(loc_flat, shape_flat, gt.bboxes,
                                    gt.mask)
    return dict(loss_loc=loc_weight * lloc.mean(),
                loss_shape=shape_weight * lshape.mean())
