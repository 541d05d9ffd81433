"""RPN head: objectness + deltas, proposal generation, RPN loss.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/rpn_head.py
with the Faster R-CNN FPN config: anchors scales=[8] ratios=[0.5,1,2] on
strides (4..64); train assignment MaxIoU(0.7/0.3, min_pos_iou 0.3,
match_low_quality); RandomSampler(256, 0.5); BCE objectness + L1 deltas;
proposals = per-level top-k by score -> decode -> class-agnostic NMS(0.7) ->
top max_num, all fixed-shape.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import binary_cross_entropy_with_logits, l1_loss
from ...ops import nms_select
from ...structures.boxes import bbox_area
from ...task import AnchorGenerator
from ...task.anchors import valid_flags_jax
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ...task.samplers import random_sample
from ..layers import torch_pad
from .gfl_head import AnchorContext


def rpn_anchor_generator():
    return AnchorGenerator(strides=(4, 8, 16, 32, 64),
                           ratios=(0.5, 1.0, 2.0), octave_base_scale=8,
                           scales_per_octave=1)


class RPNHeadNet(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_base_anchors: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.feat_channels, (3, 3),
                       padding=[torch_pad(3)] * 2,
                       kernel_init=nn.initializers.normal(0.01),
                       name='rpn_conv')
        cls = nn.Conv(self.num_base_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name='rpn_cls')
        reg = nn.Conv(self.num_base_anchors * 4, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name='rpn_reg')
        outs_cls, outs_reg = [], []
        for x in feats:
            y = nn.relu(conv(x))
            outs_cls.append(cls(y))
            outs_reg.append(reg(y).astype(jnp.float32))
        return outs_cls, outs_reg


@dataclass(frozen=True)
class RPNTrainConfig:
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    num_samples: int = 256
    pos_fraction: float = 0.5
    cls_weight: float = 1.0
    bbox_weight: float = 1.0
    pad_divisor: int = 32


@dataclass(frozen=True)
class ProposalConfig:
    nms_pre: int = 1000
    max_per_img: int = 1000
    iou_threshold: float = 0.7
    min_bbox_size: float = 0.0


def rpn_loss(ctx: AnchorContext, cls_flat, reg_flat, gt, img_shapes, rng,
             coder: DeltaXYWHBBoxCoder,
             cfg: RPNTrainConfig = RPNTrainConfig(), num_base_anchors=3):
    """cls_flat (B, N) objectness logits; reg_flat (B, N, 4) deltas."""
    anchors = jnp.asarray(ctx.anchors)
    b = cls_flat.shape[0]
    rngs = jax.random.split(rng, b)

    def single(cls_i, reg_i, gt_b, gt_l, gt_m, shape, key):
        pad_shape = jnp.ceil(shape / cfg.pad_divisor) * cfg.pad_divisor
        vf = valid_flags_jax(ctx.featmap_sizes, ctx.strides, pad_shape,
                             num_base_anchors=num_base_anchors)
        res = max_iou_assign(anchors, gt_b, jnp.zeros_like(gt_l), gt_m,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou,
                             match_low_quality=True, valid_flags=vf)
        neg_mask = (~res.pos_mask) & (res.labels != -2) & vf
        sample = random_sample(key, res.pos_mask & vf, neg_mask,
                               num=cfg.num_samples,
                               pos_fraction=cfg.pos_fraction)
        sel_w = sample.valid.astype(jnp.float32)
        n_sampled = jnp.maximum(sel_w.sum(), 1.0)

        tgt = jnp.where(sample.is_pos, 1.0, 0.0)
        bce = binary_cross_entropy_with_logits(cls_i[sample.idx], tgt)
        loss_cls = (bce * sel_w).sum() / n_sampled

        pos_w = (sample.is_pos & sample.valid).astype(jnp.float32)
        deltas_t = coder.encode(anchors[sample.idx],
                                gt_b[res.gt_idx[sample.idx]])
        deltas_t = jnp.nan_to_num(deltas_t, nan=0.0, posinf=0.0,
                                  neginf=0.0)
        l1 = jnp.abs(reg_i[sample.idx] - deltas_t).sum(-1)
        loss_bbox = (l1 * pos_w).sum() / n_sampled
        return loss_cls, loss_bbox

    lc, lb = jax.vmap(single)(cls_flat, reg_flat, gt.bboxes, gt.labels,
                              gt.mask, img_shapes, rngs)
    return dict(loss_rpn_cls=cfg.cls_weight * lc.mean(),
                loss_rpn_bbox=cfg.bbox_weight * lb.mean())


def rpn_proposals(ctx: AnchorContext, cls_lvl, reg_lvl, img_shapes,
                  coder: DeltaXYWHBBoxCoder,
                  cfg: ProposalConfig = ProposalConfig()):
    """Per-image fixed-size proposals: (B, max_per_img, 4) + scores + mask."""
    b = cls_lvl[0].shape[0]
    anchors_np = ctx.anchors
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_by_lvl, reg_by_lvl, img_shape):
        boxes_all, scores_all, lvl_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(cls_by_lvl[lvl][:, 0])
            k = min(cfg.nms_pre, n_l)
            top_s, top_idx = jax.lax.top_k(scores, k)
            pri = jnp.asarray(anchors_np[slices[lvl]:slices[lvl + 1]])
            boxes = coder.decode(pri[top_idx], reg_by_lvl[lvl][top_idx],
                                 max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s)
            lvl_all.append(jnp.full((k,), lvl, jnp.int32))
            mask_all.append(jnp.ones((k,), bool))
        boxes = jnp.concatenate(boxes_all)
        scores = jnp.concatenate(scores_all)
        lvls = jnp.concatenate(lvl_all)
        valid = jnp.concatenate(mask_all)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = valid & (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)
        # NMS is level-independent for RPN in mmdet 3.x (level as class idx)
        ob, os_, _, om = nms_select(boxes, scores, lvls,
                                    cfg.iou_threshold, cfg.max_per_img,
                                    valid_mask=valid)
        return ob, os_, om

    cls_b = [m.reshape(b, -1, 1) for m in cls_lvl]
    reg_b = [m.reshape(b, -1, 4) for m in reg_lvl]
    return jax.vmap(single)(cls_b, reg_b, img_shapes)
