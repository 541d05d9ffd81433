"""SSD head: multi-ratio anchors, softmax classification, hard-negative
mining, delta regression.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/ssd_head.py
with the ssd300 config: per-level 3x3 convs to A*(C+1) and A*4; SSD anchor
scheme (basesize ratio range 0.15-0.9, per-level extra ratios
[2],[2,3],[2,3],[2,3],[2],[2] -> 4/6/6/6/4/4 anchors); MaxIoU assignment
(0.5/0.5/0.2); softmax CE with 3:1 online hard-negative mining; SmoothL1 on
DeltaXYWH targets (stds 0.1/0.2).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import cross_entropy_int, smooth_l1_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ..layers import torch_pad
from .gfl_head import GFLTestConfig

#: per-input-size level layout (reference configs/ssd/ssd300_coco.py and
#: ssd512_coco.py anchor_generator strides/ratios)
SSD_STRIDES = {300: (8, 16, 32, 64, 100, 300),
               512: (8, 16, 32, 64, 128, 256, 512)}
SSD_RATIOS = {300: ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
              512: ((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,))}
SSD300_STRIDES = SSD_STRIDES[300]  # kept for import compatibility
SSD300_RATIOS = SSD_RATIOS[300]
#: basesize ratio range per input size (COCO recipes)
SSD_RATIO_RANGE = {300: (0.15, 0.9), 512: (0.1, 0.9)}
#: first-level (min, max) percent insert per (input_size, min_ratio%)
#: (SSDAnchorGenerator, anchor_generator.py:551-575)
_FIRST_LEVEL = {(300, 15): (7, 15), (300, 20): (10, 20),
                (512, 10): (4, 10), (512, 15): (7, 15)}


def ssd_sizes(input_size=300, ratio_range=None):
    """Per-level (min_size, max_size) following the published SSD scheme
    (int-truncating, matching SSDAnchorGenerator's hard-coded path)."""
    ratio_range = ratio_range or SSD_RATIO_RANGE[input_size]
    num_levels = len(SSD_STRIDES[input_size])
    min_r, max_r = int(ratio_range[0] * 100), int(ratio_range[1] * 100)
    step = int((max_r - min_r) / (num_levels - 2))
    mins, maxs = [], []
    for r in range(min_r, max_r + 1, step):
        mins.append(int(input_size * r / 100))
        maxs.append(int(input_size * (r + step) / 100))
    f_min, f_max = _FIRST_LEVEL[(input_size, min_r)]
    mins.insert(0, int(input_size * f_min / 100))
    maxs.insert(0, int(input_size * f_max / 100))
    return list(zip(mins[:num_levels], maxs[:num_levels]))


def ssd300_sizes(input_size=300, ratio_range=(0.15, 0.9)):
    return ssd_sizes(input_size, ratio_range)


@dataclass(frozen=True)
class SSDAnchorContext:
    image_shape: Tuple[int, int]
    featmap_sizes: Tuple[Tuple[int, int], ...]
    num_level_anchors: Tuple[int, ...]
    anchors_per_cell: Tuple[int, ...]
    anchors: np.ndarray  # (N, 4)

    @staticmethod
    def build(image_shape=(300, 300), input_size=300, strides=None,
              lvl_ratios=None, level_sizes=None):
        """Default tables come from ``input_size``; SSDLite-style recipes
        pass explicit ``strides``/``lvl_ratios``/``level_sizes``
        (reference configs/ssd/ssdlite_mobilenetv2-scratch config:
        min_sizes/max_sizes set manually)."""
        strides = strides or SSD_STRIDES[input_size]
        lvl_ratios = lvl_ratios or SSD_RATIOS[input_size]
        sizes = [(math.ceil(image_shape[0] / s),
                  math.ceil(image_shape[1] / s)) for s in strides]
        level_sizes = level_sizes or ssd_sizes(input_size)
        all_anchors, counts, per_cell = [], [], []
        for (h, w), stride, (mn, mx), ratios in zip(
                sizes, strides, level_sizes, lvl_ratios):
            whs = [(mn, mn), (math.sqrt(mn * mx), math.sqrt(mn * mx))]
            for r in ratios:
                sr = math.sqrt(r)
                whs.append((mn * sr, mn / sr))
                whs.append((mn / sr, mn * sr))
            cx = (np.arange(w, dtype=np.float32) + 0.5) * stride
            cy = (np.arange(h, dtype=np.float32) + 0.5) * stride
            gx, gy = np.meshgrid(cx, cy)
            centers = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            boxes = []
            for (aw, ah) in whs:
                boxes.append(np.concatenate(
                    [centers - [aw / 2, ah / 2],
                     centers + [aw / 2, ah / 2]], axis=-1))
            lvl = np.stack(boxes, axis=1).reshape(-1, 4)  # cell-major
            all_anchors.append(lvl.astype(np.float32))
            counts.append(len(lvl))
            per_cell.append(len(whs))
        return SSDAnchorContext(
            image_shape=tuple(image_shape), featmap_sizes=tuple(sizes),
            num_level_anchors=tuple(counts),
            anchors_per_cell=tuple(per_cell),
            anchors=np.concatenate(all_anchors))


class SSDHeadNet(nn.Module):
    num_classes: int
    anchors_per_cell: Tuple[int, ...] = (4, 6, 6, 6, 4, 4)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_out, reg_out = [], []
        for i, (x, a) in enumerate(zip(feats, self.anchors_per_cell)):
            cls_out.append(
                nn.Conv(a * (self.num_classes + 1), (3, 3),
                        padding=[torch_pad(3)] * 2,
                        name=f'cls_conv_{i}')(x).astype(jnp.float32))
            reg_out.append(
                nn.Conv(a * 4, (3, 3), padding=[torch_pad(3)] * 2,
                        name=f'reg_conv_{i}')(x).astype(jnp.float32))
        return cls_out, reg_out


@flax.struct.dataclass
class SSDTargets:
    labels: jnp.ndarray
    deltas: jnp.ndarray
    pos_mask: jnp.ndarray
    valid: jnp.ndarray


def ssd_targets(ctx: SSDAnchorContext, gt, num_classes,
                coder: DeltaXYWHBBoxCoder, pos_iou_thr=0.5,
                neg_iou_thr=0.5, min_pos_iou=0.0):
    # min_pos_iou=0. per configs/_base_/models/ssd300.py:48
    anchors = jnp.asarray(ctx.anchors)

    def single(gt_b, gt_l, gt_m):
        res = max_iou_assign(anchors, gt_b, gt_l, gt_m,
                             pos_iou_thr=pos_iou_thr,
                             neg_iou_thr=neg_iou_thr,
                             min_pos_iou=min_pos_iou,
                             match_low_quality=True)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        deltas = coder.encode(anchors, gt_b[res.gt_idx])
        deltas = jnp.nan_to_num(deltas, nan=0.0, posinf=0.0, neginf=0.0)
        valid = res.labels != -2
        return labels.astype(jnp.int32), deltas, res.pos_mask, valid

    labels, deltas, pos, valid = jax.vmap(single)(gt.bboxes, gt.labels,
                                                  gt.mask)
    return SSDTargets(labels=labels, deltas=deltas, pos_mask=pos,
                      valid=valid)


def ssd_loss(cls_scores, bbox_preds, targets: SSDTargets, num_classes,
             neg_pos_ratio=3, smoothl1_beta=1.0):
    """cls (B, N, C+1) logits (softmax, bg = C); bbox (B, N, 4) deltas."""
    b, n, _ = cls_scores.shape
    pos = targets.pos_mask
    labels = jnp.where(pos, targets.labels, num_classes)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    ce = cross_entropy_int(cls_scores.reshape(-1, num_classes + 1),
                           labels.reshape(-1)).reshape(b, n)
    # hard negative mining: top (3 * num_pos_i) negative CE per image
    neg_ce = jnp.where(pos | ~targets.valid, -jnp.inf, ce)

    def mine(neg_row, n_pos_i):
        order = jnp.argsort(-neg_row)
        ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
        keep = ranks < (neg_pos_ratio * n_pos_i)
        return keep & (neg_row > -jnp.inf)

    n_pos_img = pos.sum(axis=1)
    neg_keep = jax.vmap(mine)(neg_ce, n_pos_img)
    loss_cls = (ce * (pos | neg_keep)).sum() / num_pos

    sl1 = smooth_l1_loss(bbox_preds, targets.deltas, reduction='none',
                         beta=smoothl1_beta).sum(-1)
    loss_bbox = (sl1 * pos).sum() / num_pos
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def ssd_predict(ctx: SSDAnchorContext, cls_lvl, reg_lvl, meta,
                coder: DeltaXYWHBBoxCoder, num_classes,
                cfg: GFLTestConfig = GFLTestConfig(score_thr=0.02,
                                                   iou_threshold=0.45,
                                                   max_per_img=200),
                rescale=True) -> DetResults:
    b = cls_lvl[0].shape[0]
    anchors_np = ctx.anchors
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_by_lvl, reg_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.softmax(cls_by_lvl[lvl],
                                    axis=-1)[:, :num_classes]
            k = min(cfg.nms_pre, n_l * num_classes)
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(anchors_np[slices[lvl]:slices[lvl + 1]])
            boxes = coder.decode(pri[top_idx], reg_by_lvl[lvl][top_idx],
                                 max_shape=img_shape)
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

    cls_b, reg_b = [], []
    for m, a in zip(cls_lvl, ctx.anchors_per_cell):
        cls_b.append(m.reshape(b, -1, num_classes + 1))
    for m in reg_lvl:
        reg_b.append(m.reshape(b, -1, 4))
    return jax.vmap(single)(cls_b, reg_b, meta.img_shape,
                            meta.scale_factor)
