"""YOLOF dense head (single C5 level, implicit objectness, uniform match).

Behavioural mirror of /root/reference/mmdet/models/dense_heads/yolof_head.py
+ configs/yolof/yolof_r50-c5_8xb8-1x_coco.py: 2-conv cls subnet and 4-conv
reg subnet (conv+BN+ReLU), 5 square anchors per cell (scales 1/2/4/8/16 at
stride 32), the implicit-objectness log-merge (:120-126), UniformAssigner
targets, FocalLoss (avg = total positives) + GIoU on the matched candidate
predictions (:195-211), DeltaXYWH coder with center clamp 32.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss, sigmoid_focal_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task import AnchorGenerator
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.uniform import uniform_assign
from ..layers import bias_init_prob, torch_pad
from .gfl_head import AnchorContext, GFLTestConfig

INF = 1e8


def yolof_anchor_generator():
    return AnchorGenerator(strides=(32,), ratios=(1.0,),
                           scales=(1, 2, 4, 8, 16))


def yolof_coder():
    return DeltaXYWHBBoxCoder(add_ctr_clamp=True, ctr_clamp=32)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[torch_pad(self.kernel)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn')(x)
        return nn.relu(x)


class YOLOFHeadNet(nn.Module):
    num_classes: int
    in_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    num_base_anchors: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x
        for i in range(self.num_cls_convs):
            c = _ConvBN(self.in_channels, name=f'cls_conv_{i}')(c, train)
        r = x
        for i in range(self.num_reg_convs):
            r = _ConvBN(self.in_channels, name=f'reg_conv_{i}')(r, train)
        a = self.num_base_anchors
        cls_score = nn.Conv(a * self.num_classes, (3, 3),
                            padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=bias_init_prob(0.01),
                            name='cls_score')(c).astype(jnp.float32)
        bbox_pred = nn.Conv(a * 4, (3, 3), padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            name='bbox_pred')(r).astype(jnp.float32)
        objectness = nn.Conv(a, (3, 3), padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             name='objectness')(r).astype(jnp.float32)
        # implicit objectness merge (yolof_head.py:120-126)
        b, h, w, _ = cls_score.shape
        cs = cls_score.reshape(b, h, w, a, self.num_classes)
        ob = objectness.reshape(b, h, w, a, 1)
        norm = cs + ob - jnp.log(
            1.0 + jnp.clip(jnp.exp(cs), None, INF) +
            jnp.clip(jnp.exp(ob), None, INF))
        return norm.reshape(b, h, w, a * self.num_classes), bbox_pred


@dataclass(frozen=True)
class YOLOFTrainConfig:
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_weight: float = 1.0
    bbox_weight: float = 1.0


def yolof_loss(ctx: AnchorContext, cls_scores, bbox_preds, gt, num_classes,
               coder: DeltaXYWHBBoxCoder,
               cfg: YOLOFTrainConfig = YOLOFTrainConfig()):
    """cls (B,N,C) merged logits; bbox (B,N,4) deltas."""
    b, n, c = cls_scores.shape
    anchors = jnp.asarray(ctx.anchors)

    def single(cls_s, deltas, gt_b, gt_l, gt_m):
        decoded = coder.decode(anchors, deltas)
        res = uniform_assign(anchors, decoded, gt_b, gt_l, gt_m,
                             num_classes, cfg.match_times,
                             cfg.pos_ignore_thr, cfg.neg_ignore_thr)
        cand_pred = decoded[res.cand_anchor]
        cand_tgt = gt_b[res.cand_gt]
        return res.labels, res.label_weights, res.num_pos, \
            cand_pred, cand_tgt, res.cand_weight

    labels, lw, num_pos, cand_pred, cand_tgt, cand_w = jax.vmap(single)(
        cls_scores, bbox_preds, gt.bboxes, gt.labels, gt.mask)
    avg = jnp.maximum(num_pos.sum(), 1.0)
    loss_cls = cfg.cls_weight * sigmoid_focal_loss(
        cls_scores.reshape(-1, c), labels.reshape(-1),
        weight=lw.reshape(-1), gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        avg_factor=avg)
    loss_bbox = cfg.bbox_weight * giou_loss(
        cand_pred.reshape(-1, 4), cand_tgt.reshape(-1, 4),
        weight=cand_w.reshape(-1), avg_factor=avg)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def yolof_predict(ctx: AnchorContext, cls_scores, bbox_preds, meta,
                  coder: DeltaXYWHBBoxCoder,
                  cfg: GFLTestConfig = GFLTestConfig(iou_threshold=0.6),
                  num_classes=80, rescale=True) -> DetResults:
    """Single-level anchor predict; cls (B,N,C), bbox (B,N,4)."""
    anchors = jnp.asarray(ctx.anchors)
    n = anchors.shape[0]

    def single(cls_s, deltas, img_shape, scale_factor):
        scores = jax.nn.sigmoid(cls_s)
        k = min(cfg.nms_pre, n * num_classes) if cfg.nms_pre > 0 \
            else n * num_classes
        top_s, top_lab, top_idx, mask = filter_scores_and_topk(
            scores, cfg.score_thr, k)
        boxes = coder.decode(anchors[top_idx], deltas[top_idx],
                             max_shape=img_shape)
        scores_, valid, boxes, labels = cap_candidates(
            top_s, mask, cfg.pre_nms_total, boxes, top_lab)
        if rescale:
            boxes = scale_boxes(boxes, 1.0 / scale_factor)
        ob, os_, ol, om = nms_select(boxes, scores_, labels,
                                     cfg.iou_threshold, cfg.max_per_img,
                                     valid_mask=valid)
        return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

    return jax.vmap(single)(cls_scores, bbox_preds, meta.img_shape,
                            meta.scale_factor)
