"""YOLOv3 head: per-level bridge conv + prediction conv, grid assignment,
YOLO box coding, losses, predict.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/yolo_head.py
+ task_modules YOLOAnchorGenerator / GridAssigner / YOLOBBoxCoder:
  * 3 shape-anchors per level at strides (32, 16, 8);
  * a gt is assigned to anchors of its CENTER CELL with IoU >= pos_thr, plus
    the per-gt best responsible anchor (min_pos_iou=0);
  * box coding: xy = sigmoid(raw) + cell offset (times stride),
    wh = exp(raw) * anchor size;
  * losses: BCE cls (multi-label), BCE objectness (ignored where a
    non-positive anchor overlaps gt > neg_iou_thr), BCE xy, MSE wh.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import binary_cross_entropy_with_logits
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ..backbones.darknet import ConvBN
from ..layers import torch_pad
from .gfl_head import GFLTestConfig

YOLO_ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),   # stride 32
    ((30, 61), (62, 45), (59, 119)),       # stride 16
    ((10, 13), (16, 30), (33, 23)),        # stride 8
)
YOLO_STRIDES = (32, 16, 8)


class YOLOV3HeadNet(nn.Module):
    num_classes: int
    in_channels: Tuple[int, ...] = (512, 256, 128)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, x in enumerate(feats):
            y = ConvBN(self.in_channels[i] * 2, 3,
                       name=f'bridge_{i}')(x, train)
            y = nn.Conv(3 * (5 + self.num_classes), (1, 1),
                        name=f'pred_{i}')(y)
            outs.append(y.astype(jnp.float32))
        return outs


@dataclass(frozen=True)
class YOLOContext:
    """Static per-bucket grid info for the three YOLO levels."""
    image_shape: Tuple[int, int]
    featmap_sizes: Tuple[Tuple[int, int], ...]
    num_level_anchors: Tuple[int, ...]
    anchors: np.ndarray       # (N, 4) anchor boxes centered on cells
    cell_xy: np.ndarray       # (N, 2) cell top-left in image coords
    anchor_wh: np.ndarray     # (N, 2)
    stride: np.ndarray        # (N,)

    @staticmethod
    def build(image_shape):
        import math
        sizes = [(math.ceil(image_shape[0] / s),
                  math.ceil(image_shape[1] / s)) for s in YOLO_STRIDES]
        boxes, cells, whs, strides, counts = [], [], [], [], []
        for (h, w), s, anchors in zip(sizes, YOLO_STRIDES, YOLO_ANCHORS):
            xs = np.arange(w, dtype=np.float32) * s
            ys = np.arange(h, dtype=np.float32) * s
            gx, gy = np.meshgrid(xs, ys)
            cell = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (hw, 2)
            for (aw, ah) in anchors:
                cx = cell[:, 0] + s / 2
                cy = cell[:, 1] + s / 2
                boxes.append(np.stack([cx - aw / 2, cy - ah / 2,
                                       cx + aw / 2, cy + ah / 2], -1))
                cells.append(cell)
                whs.append(np.tile([[aw, ah]], (len(cell), 1)))
                strides.append(np.full(len(cell), s, np.float32))
            counts.append(len(cell) * 3)
        return YOLOContext(
            image_shape=tuple(image_shape), featmap_sizes=tuple(sizes),
            num_level_anchors=tuple(counts),
            anchors=np.concatenate(boxes).astype(np.float32),
            cell_xy=np.concatenate(cells).astype(np.float32),
            anchor_wh=np.concatenate(whs).astype(np.float32),
            stride=np.concatenate(strides))


def _flatten_pred(level_maps, num_classes):
    """[(B, H, W, 3*(5+C))] -> (B, N, 5+C) with anchor-minor layout
    matching YOLOContext (per level: anchor-major blocks of cells)."""
    outs = []
    b = level_maps[0].shape[0]
    for m in level_maps:
        hw = m.shape[1] * m.shape[2]
        m = m.reshape(b, hw, 3, 5 + num_classes)
        m = jnp.swapaxes(m, 1, 2).reshape(b, 3 * hw, 5 + num_classes)
        outs.append(m)
    return jnp.concatenate(outs, axis=1)


@flax.struct.dataclass
class YOLOTargets:
    pos_mask: jnp.ndarray     # (B, N)
    neg_mask: jnp.ndarray     # (B, N) contributes to objectness-0 loss
    xy_t: jnp.ndarray         # (B, N, 2) in [0, 1]
    wh_t: jnp.ndarray         # (B, N, 2) log-space
    labels: jnp.ndarray       # (B, N)


def yolo_targets(ctx: YOLOContext, gt, pos_iou_thr=0.5, neg_iou_thr=0.5):
    anchors = jnp.asarray(ctx.anchors)
    cell_xy = jnp.asarray(ctx.cell_xy)
    anchor_wh = jnp.asarray(ctx.anchor_wh)
    stride = jnp.asarray(ctx.stride)

    def single(gt_b, gt_l, gt_m):
        ious = bbox_overlaps(anchors, gt_b)  # (N, G)
        ious = jnp.where(gt_m[None, :], ious, 0.0)
        gcx = (gt_b[:, 0] + gt_b[:, 2]) / 2
        gcy = (gt_b[:, 1] + gt_b[:, 3]) / 2
        # responsibility: gt center inside the anchor's cell
        rx = (gcx[None, :] >= cell_xy[:, 0:1]) & \
             (gcx[None, :] < cell_xy[:, 0:1] + stride[:, None])
        ry = (gcy[None, :] >= cell_xy[:, 1:2]) & \
             (gcy[None, :] < cell_xy[:, 1:2] + stride[:, None])
        resp = rx & ry & gt_m[None, :]

        pos_pair = resp & (ious >= pos_iou_thr)
        # per-gt best responsible anchor forced positive (min_pos_iou=0)
        resp_ious = jnp.where(resp, ious, -1.0)
        best = resp_ious.argmax(axis=0)  # (G,)
        n = anchors.shape[0]
        forced = jnp.zeros((n, gt_b.shape[0]), bool).at[
            best, jnp.arange(gt_b.shape[0])].set(True)
        forced = forced & gt_m[None, :] & (resp_ious.max(axis=0) > -1.0)
        pos_pair = pos_pair | forced

        # resolve multi-gt per anchor by max IoU
        sel = jnp.where(pos_pair, ious, -1.0)
        gidx = sel.argmax(axis=1)
        pos = sel.max(axis=1) > -1.0

        labels = jnp.where(pos, gt_l[gidx], 0).astype(jnp.int32)
        xy_t = jnp.stack([(gcx[gidx] - cell_xy[:, 0]) / stride,
                          (gcy[gidx] - cell_xy[:, 1]) / stride], axis=-1)
        xy_t = jnp.clip(xy_t, 1e-4, 1 - 1e-4)
        gw = jnp.maximum(gt_b[gidx, 2] - gt_b[gidx, 0], 1e-3)
        gh = jnp.maximum(gt_b[gidx, 3] - gt_b[gidx, 1], 1e-3)
        wh_t = jnp.log(jnp.stack([gw, gh], -1) / anchor_wh)
        # objectness negatives: below neg_iou_thr with EVERY gt
        neg = (ious.max(axis=1) < neg_iou_thr) & ~pos
        return pos, neg, xy_t, wh_t, labels

    pos, neg, xy_t, wh_t, labels = jax.vmap(single)(gt.bboxes, gt.labels,
                                                    gt.mask)
    return YOLOTargets(pos_mask=pos, neg_mask=neg, xy_t=xy_t, wh_t=wh_t,
                      labels=labels)


def yolo_loss(ctx: YOLOContext, preds, targets: YOLOTargets, num_classes,
              cls_weight=1.0, conf_weight=1.0, xy_weight=2.0,
              wh_weight=2.0):
    """preds: (B, N, 5+C) raw maps [xy(2), wh(2), obj(1), cls(C)].

    Reference normalization (yolo_head.py:339-389 loss_by_feat_single +
    the mmdet weighted-'mean' reduction): each term is a PER-LEVEL
    weighted mean over every element of that level's prediction tensor
    (batch x anchors x channels — negatives included in the denominator),
    and the per-level losses sum. NOT a global sum over positives.
    """
    pos = targets.pos_mask.astype(jnp.float32)
    neg = targets.neg_mask.astype(jnp.float32)
    b = preds.shape[0]

    xy = preds[..., 0:2]
    wh = preds[..., 2:4]
    obj = preds[..., 4]
    cls = preds[..., 5:]

    bce_xy = (binary_cross_entropy_with_logits(xy, targets.xy_t) *
              pos[..., None]).sum(-1)
    mse_wh = (jnp.square(wh - targets.wh_t) * pos[..., None]).sum(-1)
    bce_obj = binary_cross_entropy_with_logits(obj, pos) * (pos + neg)
    onehot = jax.nn.one_hot(targets.labels, num_classes)
    bce_cls = (binary_cross_entropy_with_logits(cls, onehot) *
               pos[..., None]).sum(-1)

    loss_xy = loss_wh = loss_conf = loss_cls = 0.0
    start = 0
    for n_l in ctx.num_level_anchors:
        sl = slice(start, start + n_l)
        start += n_l
        loss_xy += xy_weight * bce_xy[:, sl].sum() / (b * n_l * 2)
        loss_wh += wh_weight * mse_wh[:, sl].sum() / (b * n_l * 2)
        loss_conf += conf_weight * bce_obj[:, sl].sum() / (b * n_l)
        loss_cls += cls_weight * bce_cls[:, sl].sum() / \
            (b * n_l * num_classes)
    return dict(loss_cls=loss_cls, loss_conf=loss_conf, loss_xy=loss_xy,
                loss_wh=loss_wh)


def yolo_decode(ctx: YOLOContext, preds):
    """(B, N, 5+C) raw -> (boxes (B, N, 4), obj (B, N), cls (B, N, C))."""
    cell_xy = jnp.asarray(ctx.cell_xy)[None]
    stride = jnp.asarray(ctx.stride)[None, :, None]
    anchor_wh = jnp.asarray(ctx.anchor_wh)[None]
    xy = jax.nn.sigmoid(preds[..., 0:2]) * stride + cell_xy
    wh = jnp.exp(jnp.clip(preds[..., 2:4], -20, 10)) * anchor_wh
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return boxes, jax.nn.sigmoid(preds[..., 4]), \
        jax.nn.sigmoid(preds[..., 5:])


def yolo_predict(ctx: YOLOContext, preds, meta, num_classes,
                 cfg: GFLTestConfig = GFLTestConfig(score_thr=0.05,
                                                    iou_threshold=0.45),
                 rescale=True) -> DetResults:
    boxes_all, obj, cls = yolo_decode(ctx, preds)

    def single(boxes, conf, scores, img_shape, scale_factor):
        scores = scores * conf[:, None]
        k = min(cfg.nms_pre, scores.shape[0] * scores.shape[1])
        top_s, top_lab, top_idx, mask = filter_scores_and_topk(
            scores, cfg.score_thr, k)
        bsel = boxes[top_idx]
        h, w = img_shape[0], img_shape[1]
        wh_clip = jnp.stack([w, h, w, h]).astype(bsel.dtype)
        bsel = jnp.clip(bsel, 0, wh_clip)
        top_s, mask, bsel, top_lab = cap_candidates(
            top_s, mask, cfg.pre_nms_total, bsel, top_lab)
        if rescale:
            bsel = scale_boxes(bsel, 1.0 / scale_factor)
        ob, os_, ol, om = nms_select(bsel, top_s, top_lab,
                                     cfg.iou_threshold, cfg.max_per_img,
                                     valid_mask=mask)
        return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

    return jax.vmap(single)(boxes_all, obj, cls, meta.img_shape,
                            meta.scale_factor)
