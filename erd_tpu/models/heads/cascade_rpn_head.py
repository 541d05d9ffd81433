"""Cascade RPN: two-stage anchor refinement with adaptive convolutions.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/cascade_rpn_head.py +
configs/cascade_rpn/cascade-rpn_r50-caffe_fpn_1x_coco.py: stage 1 runs a
DILATION AdaptiveConv (3x3, dilation 3) over a single square anchor per
cell (scale 8, ratio 1), regresses refined anchors (stds 0.1/0.5,
reg_decoded_bbox -> linear IoU loss x10) under a RegionAssigner
(center_ratio 0.2 positive core, ignore_ratio 0.5 ring + adjacent-level
centers ignored), and bridges its features to stage 2; stage 2 runs an
OFFSET AdaptiveConv — a deform conv whose kernel taps follow each cell's
refined anchor (anchor_offset:423-473: shape offset (w/stride/(ks-1) -
dilation) * grid + center offset anchor_center/stride - cell) — with
objectness (BCE) + regression (stds 0.05/0.1, IoU loss) trained with
MaxIoU(0.7/0.7, min 0.3) + RandomSampler(256, 0.5) on the refined
anchors. Proposals: stage-2 scores, stage-2 deltas decoded on refined
anchors, NMS(0.8).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import binary_cross_entropy_with_logits, iou_loss
from ...ops import nms_select
from ...ops.deform_conv import deform_conv2d
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ...task.samplers import random_sample

OCTAVE = 8.0
CENTER_RATIO = 0.2
IGNORE_RATIO = 0.5

STAGE1_CODER = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.5, 0.5))
STAGE2_CODER = DeltaXYWHBBoxCoder(target_stds=(0.05, 0.05, 0.1, 0.1))


class CascadeRPNNet(nn.Module):
    """Two StageCascadeRPNHeads with bridged features."""
    feat_channels: int = 256

    def setup(self):
        self.stage1_conv = nn.Conv(
            self.feat_channels, (3, 3), padding=[(3, 3), (3, 3)],
            kernel_dilation=(3, 3), use_bias=False,
            kernel_init=nn.initializers.normal(0.01), name='stage1_conv')
        self.stage1_reg = nn.Conv(
            4, (1, 1), kernel_init=nn.initializers.normal(0.01),
            name='stage1_reg')
        self.stage2_weight = self.param(
            'stage2_kernel', nn.initializers.normal(0.01),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        self.stage2_cls = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.01),
            name='stage2_cls')
        self.stage2_reg = nn.Conv(
            4, (1, 1), kernel_init=nn.initializers.normal(0.01),
            name='stage2_reg')

    def stage1(self, feats):
        """-> (bridged feats, per-level stage-1 deltas)."""
        bridged, regs = [], []
        for x in feats:
            y = nn.relu(self.stage1_conv(x))
            bridged.append(y)          # bridged_feature=True
            regs.append(self.stage1_reg(y).astype(jnp.float32))
        return bridged, regs

    def stage2(self, feats, offsets):
        """offsets: per-level (B, H, W, 9, 2) anchor-derived taps."""
        clss, regs = [], []
        for x, off in zip(feats, offsets):
            def single(xi, oi):
                return deform_conv2d(xi.astype(jnp.float32),
                                     oi[:, :, None], self.stage2_weight,
                                     stride=1, padding=1)

            y = nn.relu(jax.vmap(single)(x, off))
            clss.append(self.stage2_cls(y).astype(jnp.float32))
            regs.append(self.stage2_reg(y).astype(jnp.float32))
        return clss, regs

    def __call__(self, feats):
        bridged, reg1 = self.stage1(feats)
        offsets = [jnp.zeros(f.shape[:3] + (9, 2), jnp.float32)
                   for f in feats]
        cls2, reg2 = self.stage2(bridged, offsets)
        return reg1, cls2, reg2


def square_anchors(points, stride_per_point, scale=OCTAVE):
    half = scale * stride_per_point / 2
    return jnp.stack([points[:, 0] - half, points[:, 1] - half,
                      points[:, 0] + half, points[:, 1] + half], -1)


def anchor_offsets(anchors, points, stride_per_point):
    """(P, 9, 2) deform-conv taps tracking each cell's refined anchor
    (cascade_rpn_head.py anchor_offset; (dy, dx) pairs, mmcv layout)."""
    idx = jnp.asarray([-1.0, 0.0, 1.0])
    gy, gx = jnp.meshgrid(idx, idx, indexing='ij')
    gx = gx.reshape(-1)
    gy = gy.reshape(-1)
    w = (anchors[:, 2] - anchors[:, 0]) / stride_per_point / 2 - 1.0
    h = (anchors[:, 3] - anchors[:, 1]) / stride_per_point / 2 - 1.0
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5 / stride_per_point
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5 / stride_per_point
    grid_x = points[:, 0] / stride_per_point - 0.5
    grid_y = points[:, 1] / stride_per_point - 0.5
    off_x = w[:, None] * gx[None] + (cx - grid_x)[:, None]
    off_y = h[:, None] * gy[None] + (cy - grid_y)[:, None]
    return jnp.stack([off_y, off_x], axis=-1)


def region_assign(points, strides, num_level_points, gt_bboxes, gt_mask,
                  featmap_strides):
    """RegionAssigner (region_assigner.py): gts route to their
    scale-matched level; the center_ratio core is positive (assigned to
    the smallest covering gt), the ignore_ratio ring on the same level
    and the core on adjacent levels are ignored.

    Returns (labels (P,) {1,0,-1}, gt_idx (P,)).
    """
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
        (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1.0, None))
    target_lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / OCTAVE / featmap_strides[0]) + 0.5),
        0, len(featmap_strides) - 1).astype(jnp.int32)
    lvl_of_point = jnp.asarray(np.repeat(
        np.arange(len(num_level_points)), num_level_points))

    def region(r):
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
        hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * r / 2
        hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * r / 2
        inside = ((points[:, None, 0] >= (cx - hw)[None]) &
                  (points[:, None, 0] <= (cx + hw)[None]) &
                  (points[:, None, 1] >= (cy - hh)[None]) &
                  (points[:, None, 1] <= (cy + hh)[None]))
        return inside & gt_mask[None, :]

    in_core = region(CENTER_RATIO)
    in_ring = region(IGNORE_RATIO)
    same = lvl_of_point[:, None] == target_lvl[None, :]
    adj = jnp.abs(lvl_of_point[:, None] - target_lvl[None, :]) == 1
    pos_pair = in_core & same
    pos = pos_pair.any(axis=1)
    ign = ((in_ring & same) | (in_core & adj)).any(axis=1)
    area = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
        (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    big = jnp.asarray(1e12, jnp.float32)
    cost = jnp.where(pos_pair, area[None, :], big)
    gt_idx = cost.argmin(axis=1)
    labels = jnp.where(pos, 1, jnp.where(ign & ~pos, -1, 0))
    return labels.astype(jnp.int32), gt_idx


def cascade_rpn_loss(points, strides, num_level_points, reg1_flat,
                     cls2_flat, reg2_flat, gt, rng, featmap_strides,
                     loss_weight=10.0):
    """Both stages' losses. reg1/reg2 (B,P,4); cls2 (B,P)."""
    anchors1 = square_anchors(points, strides)
    b = reg1_flat.shape[0]
    rngs = jax.random.split(rng, b)

    def single(reg1_i, cls2_i, reg2_i, gt_b, gt_m, key):
        labels, gt_idx = region_assign(points, strides, num_level_points,
                                       gt_b, gt_m, featmap_strides)
        boxes1 = STAGE1_CODER.decode(anchors1, reg1_i)
        pos1 = (labels == 1).astype(jnp.float32)
        n1 = jnp.maximum(pos1.sum(), 1.0)
        l1 = iou_loss(boxes1, gt_b[gt_idx], linear=True, reduction="none")
        loss_reg1 = loss_weight * (l1 * pos1).sum() / n1

        refined = jax.lax.stop_gradient(boxes1)
        res = max_iou_assign(refined, gt_b, jnp.zeros_like(gt_idx), gt_m,
                             pos_iou_thr=0.7, neg_iou_thr=0.7,
                             min_pos_iou=0.3, match_low_quality=True)
        neg_mask = (~res.pos_mask) & (res.labels != -2)
        sample = random_sample(key, res.pos_mask, neg_mask, num=256,
                               pos_fraction=0.5)
        sel_w = sample.valid.astype(jnp.float32)
        n_s = jnp.maximum(sel_w.sum(), 1.0)
        tgt = jnp.where(sample.is_pos, 1.0, 0.0)
        bce = binary_cross_entropy_with_logits(cls2_i[sample.idx], tgt)
        loss_cls = (bce * sel_w).sum() / n_s
        boxes2 = STAGE2_CODER.decode(refined, reg2_i)
        pos_w = (sample.is_pos & sample.valid).astype(jnp.float32)
        l2 = iou_loss(boxes2[sample.idx],
                      gt_b[res.gt_idx[sample.idx]], linear=True,
                      reduction='none')
        n2 = jnp.maximum(pos_w.sum(), 1.0)
        loss_reg2 = loss_weight * (l2 * pos_w).sum() / n2
        return loss_reg1, loss_cls, loss_reg2

    lr1, lc, lr2 = jax.vmap(single)(reg1_flat, cls2_flat, reg2_flat,
                                    gt.bboxes, gt.mask, rngs)
    return dict(loss_stage1_reg_bbox=lr1.mean(),
                loss_rpn_cls=lc.mean(),
                loss_stage2_reg_bbox=lr2.mean())


def cascade_rpn_proposals(points, strides, num_level_points, reg1_flat,
                          cls2_flat, reg2_flat, img_shapes, cfg):
    """Decode stage-2 on refined anchors, per-level top-k, NMS."""
    anchors1 = square_anchors(points, strides)
    slices = np.concatenate([[0], np.cumsum(num_level_points)])

    def single(reg1_i, cls2_i, reg2_i, img_shape):
        refined = STAGE1_CODER.decode(anchors1, reg1_i)
        scores = jax.nn.sigmoid(cls2_i)
        boxes_all, scores_all, lvl_all = [], [], []
        for lvl in range(len(num_level_points)):
            lo, hi = int(slices[lvl]), int(slices[lvl + 1])
            k = min(cfg.nms_pre, hi - lo)
            top_s, top_idx = jax.lax.top_k(scores[lo:hi], k)
            boxes = STAGE2_CODER.decode(refined[lo:hi][top_idx],
                                        reg2_i[lo:hi][top_idx],
                                        max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s)
            lvl_all.append(jnp.full((k,), lvl, jnp.int32))
        boxes = jnp.concatenate(boxes_all)
        sc = jnp.concatenate(scores_all)
        lvls = jnp.concatenate(lvl_all)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)
        ob, os_, _, om = nms_select(boxes, sc, lvls, cfg.iou_threshold,
                                    cfg.max_per_img, valid_mask=valid)
        return ob, os_, om

    return jax.vmap(single)(reg1_flat, cls2_flat, reg2_flat, img_shapes)
