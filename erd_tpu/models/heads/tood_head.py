"""TOOD: task-aligned head (T-head) + Task Alignment Learning (TAL).

Behavioural mirror of /root/reference/mmdet/models/dense_heads/tood_head.py
(+ task_modules/assigners/task_aligned_assigner.py), TPU-redesigned:

* TaskDecomposition (:25-102): layer attention over the 6 stacked
  inter-convs folded into a dynamic 1x1 conv. The reference multiplies the
  reduction-conv WEIGHT by the per-image attention; scaling the stacked
  features before a shared 1x1 conv is the same contraction and keeps the
  conv static for XLA.
* sigmoid_geometric_mean cls score sqrt(sig(logits) * sig(prob)) (:267).
* anchor-free reg: exp distances scaled per level, decoded at
  stride-normalized anchor centers (:271-277), then refined by a learned
  per-location bilinear offset (deform_sampling :303-315 — a 1x1
  depthwise deform conv with identity weights == bilinear gather), with
  the invalid-box fallback (:293-297).
* TAL loss (:329-483): alignment metric t = s^alpha * iou^beta from the
  TaskAlignedAssigner (topk 13), per-gt normalized to the gt's max IoU,
  used as both the QFL soft target (activated form) and the GIoU weight;
  avg factors are the batch-summed metrics (reduce_mean == implicit SPMD
  global sum here). The initial-epoch ATSS+focal branch (epoch <
  initial_epoch, :366-372) is a static `initial` flag compiled as its own
  jit variant and switched by SetEpochInfoHook-style recipes.

All dynamic indexing is realized as dense masks; per-gt grouping uses
scatter-max over the padded gt axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss, quality_focal_loss_tensor_target
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults, distance2bbox
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task import task_aligned_assign
from ...task.atss import atss_assign
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad
from .gfl_head import GFLTestConfig

STRIDES = (8, 16, 32, 64, 128)
INF = 1e8


class TaskDecomposition(nn.Module):
    feat_channels: int
    stacked_convs: int

    @nn.compact
    def __call__(self, feat, avg_feat):
        # layer attention: (B,1,1,S*C) -> (B,1,1,S) sigmoid weights
        in_ch = self.feat_channels * self.stacked_convs
        la_down_rate = self.stacked_convs * 8
        w = nn.Conv(in_ch // la_down_rate, (1, 1),
                    kernel_init=nn.initializers.normal(0.001),
                    dtype=feat.dtype, name='la_conv1')(avg_feat)
        w = nn.relu(w)
        w = nn.Conv(self.stacked_convs, (1, 1),
                    kernel_init=nn.initializers.normal(0.001),
                    dtype=feat.dtype, name='la_conv2')(w)
        w = jax.nn.sigmoid(w)  # (B,1,1,S)
        b, h, ww, _ = feat.shape
        scaled = feat.reshape(b, h, ww, self.stacked_convs,
                              self.feat_channels) * w[..., None]
        scaled = scaled.reshape(b, h, ww, in_ch)
        y = nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=feat.dtype, name='reduction_conv')(scaled)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=y.dtype,
                         name='gn')(y)
        return nn.relu(y)


def _bilinear_refine(box_map, offsets):
    """Sample each of the 4 box channels at its own offset location.

    box_map: (H, W, 4); offsets: (H, W, 8) as (dy, dx) per channel
    (deform_conv2d zero-pads outside the map). Equivalent of
    tood_head.py deform_sampling (1x1 depthwise deform conv, identity
    weights).
    """
    hh, ww, _ = box_map.shape
    ys = jnp.arange(hh, dtype=offsets.dtype)[:, None]
    xs = jnp.arange(ww, dtype=offsets.dtype)[None, :]

    def one_channel(m, dy, dx):
        yy = ys + dy
        xx = xs + dx
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        out = 0.0
        for oy, wy in ((y0, y0 + 1 - yy), (y0 + 1, yy - y0)):
            for ox, wx in ((x0, x0 + 1 - xx), (x0 + 1, xx - x0)):
                inside = (oy >= 0) & (oy <= hh - 1) & (ox >= 0) & \
                         (ox <= ww - 1)
                iy = jnp.clip(oy, 0, hh - 1).astype(jnp.int32)
                ix = jnp.clip(ox, 0, ww - 1).astype(jnp.int32)
                out = out + jnp.where(inside, wy * wx * m[iy, ix], 0.0)
        return out

    chans = [one_channel(box_map[..., i], offsets[..., 2 * i],
                         offsets[..., 2 * i + 1]) for i in range(4)]
    return jnp.stack(chans, axis=-1)


class TOODHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 6
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == self.num_levels
        inter_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                  name=f'inter_conv_{i}')
                       for i in range(self.stacked_convs)]
        cls_decomp = TaskDecomposition(self.feat_channels,
                                       self.stacked_convs,
                                       name='cls_decomp')
        reg_decomp = TaskDecomposition(self.feat_channels,
                                       self.stacked_convs,
                                       name='reg_decomp')
        dtype = feats[0].dtype
        tood_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), dtype=dtype,
                           name='tood_cls')
        tood_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           dtype=dtype, name='tood_reg')
        in_ch = self.feat_channels * self.stacked_convs

        prob_conv1 = nn.Conv(in_ch // 24, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=dtype, name='cls_prob_conv1')
        prob_conv2 = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=bias_init_prob(0.01), dtype=dtype,
                             name='cls_prob_conv2')
        off_conv1 = nn.Conv(in_ch // 24, (1, 1),
                            kernel_init=nn.initializers.normal(0.001),
                            dtype=dtype, name='reg_offset_conv1')
        off_conv2 = nn.Conv(8, (3, 3), padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.001),
                            bias_init=nn.initializers.zeros, dtype=dtype,
                            name='reg_offset_conv2')

        def prob_module(feat):
            return prob_conv2(nn.relu(prob_conv1(feat)))

        def offset_module(feat):
            return off_conv2(nn.relu(off_conv1(feat)))

        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]

        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            stride = STRIDES[lvl]
            inter = []
            for conv in inter_convs:
                x = conv(x)
                inter.append(x)
            feat = jnp.concatenate(inter, axis=-1)  # (B,H,W,S*C)
            avg_feat = feat.mean(axis=(1, 2), keepdims=True)
            cls_feat = cls_decomp(feat, avg_feat)
            reg_feat = reg_decomp(feat, avg_feat)

            logits = tood_cls(cls_feat).astype(jnp.float32)
            prob = prob_module(feat).astype(jnp.float32)
            cls_score = jnp.sqrt(
                jax.nn.sigmoid(logits) * jax.nn.sigmoid(prob))

            b, h, w, _ = x.shape
            reg_dist = jnp.exp(
                scales[lvl](tood_reg(reg_feat).astype(jnp.float32)))
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
            centers = jnp.stack(
                [jnp.broadcast_to(xs, (h, w)),
                 jnp.broadcast_to(ys, (h, w))], axis=-1)  # stride units
            reg_bbox = distance2bbox(centers[None], reg_dist)  # (B,H,W,4)
            offsets = offset_module(feat).astype(jnp.float32)
            refined = jax.vmap(_bilinear_refine)(reg_bbox, offsets)
            bad = (refined[..., 0:1] > refined[..., 2:3]) | \
                  (refined[..., 1:2] > refined[..., 3:4])
            bbox = jnp.where(bad, reg_bbox, refined)

            cls_scores.append(cls_score)
            bbox_preds.append(bbox * stride)  # image units
        return cls_scores, bbox_preds


@dataclass(frozen=True)
class TOODContext:
    """Static grid: anchor centers + per-level counts (octave-8 ratio-1
    anchors reduce to stride-centered points for the anchor_free path)."""
    image_shape: Tuple[int, int]
    num_level_points: Tuple[int, ...]
    points: np.ndarray   # (N, 2) centers, image units
    strides: np.ndarray  # (N,)
    anchors: np.ndarray  # (N, 4) octave-8 square anchors (ATSS initial)

    @staticmethod
    def build(image_shape, octave_base_scale=8):
        import math
        pts, strides, anchors, counts = [], [], [], []
        for s in STRIDES:
            h = math.ceil(image_shape[0] / s)
            w = math.ceil(image_shape[1] / s)
            xs = (np.arange(w, dtype=np.float32) + 0.5) * s
            ys = (np.arange(h, dtype=np.float32) + 0.5) * s
            gx, gy = np.meshgrid(xs, ys)
            p = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            pts.append(p)
            strides.append(np.full(len(p), s, np.float32))
            half = octave_base_scale * s / 2.0
            anchors.append(np.concatenate([p - half, p + half], -1))
            counts.append(len(p))
        return TOODContext(image_shape=tuple(image_shape),
                           num_level_points=tuple(counts),
                           points=np.concatenate(pts),
                           strides=np.concatenate(strides),
                           anchors=np.concatenate(anchors))


def tood_loss(ctx: TOODContext, cls_probs, boxes, gt, num_classes,
              initial=False, alpha=1.0, beta=6.0, topk=13,
              initial_topk=9):
    """TAL (or initial-epoch ATSS+focal) loss over flattened levels.

    cls_probs: (B, N, C) ACTIVATED scores; boxes: (B, N, 4) image units.
    """
    pts = jnp.asarray(ctx.points)
    x, y = pts[:, 0:1], pts[:, 1:2]

    def single(cls_p, boxes_i, gt_b, gt_l, gt_m):
        sg_boxes = jax.lax.stop_gradient(boxes_i)
        sg_p = jax.lax.stop_gradient(cls_p)
        if initial:
            res = atss_assign(jnp.asarray(ctx.anchors),
                              ctx.num_level_points, gt_b, gt_l, gt_m,
                              topk=initial_topk)
        else:
            res = task_aligned_assign(pts, sg_boxes, sg_p, gt_b, gt_l,
                                      gt_m, topk=topk, alpha=alpha,
                                      beta=beta)
        pos = res.pos_mask
        gt_idx = res.gt_idx
        tgt_boxes = gt_b[gt_idx]
        n = pts.shape[0]

        if initial:
            # centerness weight on positives (atss_head centerness_target)
            cx = (tgt_boxes[:, 0] + tgt_boxes[:, 2]) / 2
            cy = (tgt_boxes[:, 1] + tgt_boxes[:, 3]) / 2
            l_ = pts[:, 0] - tgt_boxes[:, 0]
            t_ = pts[:, 1] - tgt_boxes[:, 1]
            r_ = tgt_boxes[:, 2] - pts[:, 0]
            b_ = tgt_boxes[:, 3] - pts[:, 1]
            del cx, cy
            lr = jnp.stack([l_, r_], -1)
            tb = jnp.stack([t_, b_], -1)
            ctrness = jnp.sqrt(jnp.clip(
                (lr.min(-1) / jnp.clip(lr.max(-1), 1e-6, None)) *
                (tb.min(-1) / jnp.clip(tb.max(-1), 1e-6, None)),
                1e-6, None))
            box_w = jnp.where(pos, ctrness, 0.0)
            # focal loss on ACTIVATED probs (FocalLoss activated=True)
            onehot = jax.nn.one_hot(jnp.where(pos, res.labels, 0),
                                    num_classes) * pos[:, None]
            p = jnp.clip(cls_p, 1e-6, 1 - 1e-6)
            pt = jnp.where(onehot > 0, p, 1 - p)
            alpha_t = jnp.where(onehot > 0, 0.25, 0.75)
            l_cls_mat = -alpha_t * (1 - pt) ** 2.0 * jnp.log(pt)
            l_cls = l_cls_mat.sum()
            cls_avg = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        else:
            # recompute the alignment metric of the assigned gt densely
            ious_mat = bbox_overlaps(sg_boxes, gt_b)
            inside = (x > gt_b[None, :, 0]) & (x < gt_b[None, :, 2]) & \
                     (y > gt_b[None, :, 1]) & (y < gt_b[None, :, 3])
            inside = inside[:, 0] if inside.ndim == 3 else inside
            valid = inside & gt_m[None, :]
            gl = jnp.clip(gt_l, 0, num_classes - 1)
            s_mat = sg_p[:, gl]  # (N, G)
            metric_mat = jnp.where(
                valid,
                jnp.power(jnp.clip(s_mat, 1e-8, None), alpha) *
                jnp.power(jnp.clip(ious_mat, 1e-8, None), beta), 0.0)
            arange = jnp.arange(n)
            m_assigned = jnp.where(pos, metric_mat[arange, gt_idx], 0.0)
            iou_assigned = jnp.where(pos, ious_mat[arange, gt_idx], 0.0)
            g = gt_b.shape[0]
            m_max = jnp.zeros((g,)).at[gt_idx].max(
                jnp.where(pos, m_assigned, 0.0))
            iou_max = jnp.zeros((g,)).at[gt_idx].max(iou_assigned)
            norm_metric = jnp.where(
                pos, m_assigned / (m_max[gt_idx] + 1e-7) * iou_max[gt_idx],
                0.0)
            target = jax.nn.one_hot(jnp.where(pos, res.labels, 0),
                                    num_classes) * norm_metric[:, None]
            l_cls = quality_focal_loss_tensor_target(
                cls_p, target, reduction='sum', activated=True)
            box_w = norm_metric
            cls_avg = norm_metric.sum()

        lb = giou_loss(boxes_i, tgt_boxes, reduction='none')
        l_box = (lb * box_w).sum()
        box_avg = box_w.sum()
        return l_cls, cls_avg, l_box, box_avg

    l_cls, cls_avg, l_box, box_avg = jax.vmap(single)(
        cls_probs, boxes, gt.bboxes, gt.labels, gt.mask)
    # batch-summed avg factors (reduce_mean analogue under SPMD)
    cls_af = jnp.maximum(cls_avg.sum(), 1.0)
    box_af = jnp.maximum(box_avg.sum(), 1.0)
    return {'loss_cls': l_cls.sum() / cls_af,
            'loss_bbox': 2.0 * l_box.sum() / box_af}


def tood_predict(ctx: TOODContext, cls_lvl, box_lvl, meta,
                 cfg: GFLTestConfig, num_classes, rescale=True):
    """Scores arrive activated, boxes decoded (tood _predict_by_feat)."""
    b = cls_lvl[0].shape[0]

    def single(cls_by_lvl, box_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_points[lvl]
            scores = cls_by_lvl[lvl]
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            bx = box_by_lvl[lvl][top_idx]
            bx = jnp.clip(
                bx,
                0.0,
                jnp.asarray([img_shape[1], img_shape[0],
                             img_shape[1], img_shape[0]], bx.dtype))
            boxes_all.append(bx)
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
    box_b = [m.reshape(b, -1, 4) for m in box_lvl]
    return jax.vmap(single)(cls_b, box_b, meta.img_shape,
                            meta.scale_factor)
