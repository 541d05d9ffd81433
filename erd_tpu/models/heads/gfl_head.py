"""GFL dense head: network module + functional loss/predict logic.

TPU-first re-derivation of /root/reference/mmdet/models/dense_heads/gfl_head.py
(structure :153-230, loss :245-406, predict :408-502) and its AnchorHead /
BaseDenseHead machinery:

  * per-image python loops (multi_apply) -> jax.vmap over the batch;
  * boolean ``nonzero`` indexing -> dense masks;
  * per-level loss accumulation -> one fused computation over the
    concatenated anchor axis (identical total by linearity, with a
    per-anchor stride vector for GFL's stride normalization);
  * cross-rank ``reduce_mean`` of loss normalizers -> global-batch sums,
    which under pjit/SPMD are already all-reduced over the data mesh.

Outputs are NHWC; the flattened "anchor axis" (sum_l H_l*W_l) is the
detection analogue of sequence length and is everywhere static.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (distribution_focal_loss, giou_loss, quality_focal_loss)
from ...ops import (cap_candidates, filter_scores_and_topk, integral,
                    nms_select, nms_select_cfg)
from ...structures import DetResults, bbox_overlaps, distance2bbox
from ...structures.boxes import bbox2distance, bbox_center, scale_boxes
from ...task import AnchorGenerator, atss_assign, featmap_sizes_for
from ...task.anchors import valid_flags_jax
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad


# ---------------------------------------------------------------------------
# Network module
# ---------------------------------------------------------------------------
class GFLHeadNet(nn.Module):
    """Shared cls/reg conv towers + gfl_cls / gfl_reg heads + per-level scale."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5
    norm: str = 'gn'

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == self.num_levels
        cls_convs = [
            ConvModule(self.feat_channels, 3, norm=self.norm,
                       name=f'cls_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            ConvModule(self.feat_channels, 3, norm=self.norm,
                       name=f'reg_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        head_dtype = feats[0].dtype
        gfl_cls = nn.Conv(self.num_classes, (3, 3),
                          padding=[torch_pad(3)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=bias_init_prob(0.01), dtype=head_dtype,
                          name='gfl_cls')
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[torch_pad(3)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=head_dtype, name='gfl_reg')
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]

        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for conv in cls_convs:
                cls_feat = conv(cls_feat)
            for conv in reg_convs:
                reg_feat = conv(reg_feat)
            cls_scores.append(gfl_cls(cls_feat))
            bbox_preds.append(scales[lvl](gfl_reg(reg_feat)).astype(
                jnp.float32))
        return cls_scores, bbox_preds


# ---------------------------------------------------------------------------
# Static per-bucket anchor context
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class AnchorContext:
    """Everything static about the anchor grid of one image-shape bucket."""
    image_shape: Tuple[int, int]
    featmap_sizes: Tuple[Tuple[int, int], ...]
    num_level_anchors: Tuple[int, ...]
    strides: Tuple[int, ...]
    anchors: np.ndarray          # (N, 4)
    stride_per_anchor: np.ndarray  # (N,)

    @staticmethod
    def build(image_shape, generator: AnchorGenerator = AnchorGenerator()):
        sizes = featmap_sizes_for(image_shape, generator.strides)
        anchors = generator.flat_anchors(sizes)
        nla = generator.num_level_anchors(sizes)
        spa = np.concatenate([
            np.full(n, s, np.float32)
            for n, s in zip(nla, generator.strides)
        ])
        return AnchorContext(
            image_shape=tuple(image_shape), featmap_sizes=tuple(sizes),
            num_level_anchors=tuple(nla), strides=tuple(generator.strides),
            anchors=anchors, stride_per_anchor=spa)

    @property
    def num_anchors(self):
        return int(self.anchors.shape[0])


@dataclass(frozen=True)
class GFLTrainConfig:
    assigner_topk: int = 9
    qfl_weight: float = 1.0
    qfl_beta: float = 2.0
    bbox_weight: float = 2.0
    dfl_weight: float = 0.25
    pad_divisor: int = 32


@dataclass(frozen=True)
class GFLTestConfig:
    score_thr: float = 0.05
    nms_pre: int = 1000
    iou_threshold: float = 0.6
    max_per_img: int = 100
    min_bbox_size: float = 0.0
    # Global cap on candidates entering NMS after level concat. The
    # reference feeds up to num_levels*nms_pre candidates to its CUDA NMS;
    # a fixed-shape NMS pays O(cap^2) memory + O(cap) sequential steps, so
    # we keep the strongest ``pre_nms_total`` by score. 2000 keeps the IoU
    # matrix at 16 MB/img while bounding the crowded-scene drop risk; raise
    # per-config (up to num_levels*nms_pre) when AR on dense scenes matters.
    pre_nms_total: int = 2000
    # 'nms' (greedy hard NMS) or 'soft_nms' (score decay, Bodla et al.);
    # the typed mirror of the reference's test_cfg.nms dict
    # (configs/faster_rcnn/faster-rcnn_r50_fpn_soft-nms_1x_coco.py,
    # configs/cornernet/*mstest* method='gaussian').
    nms_type: str = 'nms'
    soft_nms_method: str = 'linear'
    soft_nms_sigma: float = 0.5
    soft_nms_min_score: float = 1e-3


def flatten_levels(level_maps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B, H, W, C)] -> (B, sum HW, C)."""
    b = level_maps[0].shape[0]
    c = level_maps[0].shape[-1]
    return jnp.concatenate(
        [m.reshape(b, -1, c) for m in level_maps], axis=1)


# ---------------------------------------------------------------------------
# Target assignment (vmapped ATSS + GFL target construction)
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class GFLTargets:
    labels: jnp.ndarray         # (B, N) int32, num_classes == background
    label_weights: jnp.ndarray  # (B, N) float
    bbox_targets: jnp.ndarray   # (B, N, 4)
    pos_mask: jnp.ndarray       # (B, N) bool
    num_pos: jnp.ndarray        # () float — global positive count


def gfl_targets(ctx: AnchorContext, gt, img_shapes, num_classes,
                topk=9, pad_divisor=32):
    """Build per-anchor training targets for a padded batch.

    Args:
        ctx: AnchorContext of the bucket.
        gt: GTInstances with leading batch dim.
        img_shapes: (B, 2) per-image (H, W) inside the padded canvas.
        num_classes: head classes (background index).
    """
    anchors = jnp.asarray(ctx.anchors)

    def single(gt_b, gt_l, gt_m, shape):
        pad_shape = jnp.ceil(shape / pad_divisor) * pad_divisor
        vf = valid_flags_jax(ctx.featmap_sizes, ctx.strides, pad_shape)
        res = atss_assign(anchors, ctx.num_level_anchors, gt_b, gt_l, gt_m,
                          valid_flags=vf, topk=topk)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        label_weights = vf.astype(jnp.float32)
        bbox_targets = jnp.where(res.pos_mask[:, None], gt_b[res.gt_idx],
                                 0.0)
        return labels, label_weights, bbox_targets, res.pos_mask

    labels, lw, bt, pos = jax.vmap(single)(gt.bboxes, gt.labels, gt.mask,
                                           img_shapes)
    num_pos = pos.sum().astype(jnp.float32)
    return GFLTargets(labels=labels, label_weights=lw, bbox_targets=bt,
                      pos_mask=pos, num_pos=num_pos)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------
def gfl_loss(ctx: AnchorContext, cls_scores, bbox_preds, targets: GFLTargets,
             cfg: GFLTrainConfig = GFLTrainConfig(), reg_max=16):
    """Fused GFL loss over the concatenated anchor axis.

    Args:
        cls_scores: (B, N, C) logits (flattened levels).
        bbox_preds: (B, N, 4*(reg_max+1)) distribution logits.
    Returns dict(loss_cls, loss_bbox, loss_dfl) plus monitoring scalars.
    """
    b, n, c = cls_scores.shape
    anchors = jnp.asarray(ctx.anchors)
    stride = jnp.asarray(ctx.stride_per_anchor)  # (N,)
    centers_n = bbox_center(anchors)[None] / stride[None, :, None]  # (1,N,2)

    pos = targets.pos_mask  # (B, N)
    avg_cls = jnp.maximum(targets.num_pos, 1.0)

    # -- decode predictions in stride-normalized space (all anchors, masked).
    corners = integral(bbox_preds, reg_max)  # (B, N, 4)
    decoded = distance2bbox(centers_n, corners)  # (B, N, 4)
    targets_n = targets.bbox_targets / stride[None, :, None]  # (B, N, 4)

    # QFL quality score: IoU of decoded (detached) with target at positives.
    quality = bbox_overlaps(jax.lax.stop_gradient(decoded), targets_n,
                            is_aligned=True)
    quality = jnp.where(pos, quality, 0.0)

    loss_cls = cfg.qfl_weight * quality_focal_loss(
        cls_scores.reshape(b * n, c),
        (targets.labels.reshape(-1), quality.reshape(-1)),
        weight=targets.label_weights.reshape(-1),
        beta=cfg.qfl_beta, avg_factor=avg_cls)

    # weight_targets = detached max sigmoid cls score at positives.
    wt = jax.nn.sigmoid(jax.lax.stop_gradient(cls_scores)).max(axis=-1)
    wt = jnp.where(pos, wt, 0.0)  # (B, N)
    avg_reg = jnp.maximum(wt.sum(), 1.0)

    lb = giou_loss(decoded.reshape(-1, 4), targets_n.reshape(-1, 4),
                   reduction='none')
    loss_bbox = cfg.bbox_weight * (lb * wt.reshape(-1)).sum() / avg_reg

    # DFL on the 4 clamped corner targets.
    corner_targets = bbox2distance(centers_n, targets_n, max_dis=reg_max,
                                   eps=0.1)  # (B, N, 4)
    dfl = distribution_focal_loss(
        bbox_preds.reshape(b * n * 4, reg_max + 1),
        corner_targets.reshape(-1), reduction='none')
    wt4 = jnp.broadcast_to(wt[..., None], (b, n, 4)).reshape(-1)
    eps = float(np.finfo(np.float32).eps)
    loss_dfl = cfg.dfl_weight * (dfl * wt4).sum() / (4.0 + eps) / avg_reg

    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dfl=loss_dfl)


# ---------------------------------------------------------------------------
# Prediction / post-processing
# ---------------------------------------------------------------------------
def gfl_predict(ctx: AnchorContext, cls_scores_lvl, bbox_preds_lvl, meta,
                cfg: GFLTestConfig = GFLTestConfig(), reg_max=16,
                rescale=True) -> DetResults:
    """Batched inference post-processing (vmapped per image).

    Mirrors gfl_head.py:408-502 + base_dense_head.py:424-486: per level
    integral-decode x stride, threshold+top-k over (anchor, class) pairs,
    decode with img_shape clipping, concat levels, rescale, class-aware NMS,
    top max_per_img.
    """
    b = cls_scores_lvl[0].shape[0]
    num_levels = len(cls_scores_lvl)
    anchors_np = ctx.anchors
    level_slices = np.concatenate([[0], np.cumsum(ctx.num_level_anchors)])

    def single(cls_lvls, reg_lvls, img_shape, scale_factor):
        all_boxes, all_scores, all_labels, all_masks = [], [], [], []
        for lvl in range(num_levels):
            s = ctx.strides[lvl]
            n_l = ctx.num_level_anchors[lvl]
            scores = jax.nn.sigmoid(cls_lvls[lvl])  # (n_l, C)
            dist = integral(reg_lvls[lvl], reg_max) * s  # (n_l, 4)
            k = min(cfg.nms_pre, n_l * scores.shape[-1]) if cfg.nms_pre > 0 \
                else n_l * scores.shape[-1]
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            pri = jnp.asarray(
                anchors_np[level_slices[lvl]:level_slices[lvl + 1]])
            centers = bbox_center(pri)[top_idx]
            boxes = distance2bbox(centers, dist[top_idx],
                                  max_shape=img_shape)
            all_boxes.append(boxes)
            all_scores.append(top_s)
            all_labels.append(top_lab)
            all_masks.append(mask)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        labels = jnp.concatenate(all_labels)
        valid = jnp.concatenate(all_masks)
        scores, valid, boxes, labels = cap_candidates(
            scores, valid, cfg.pre_nms_total, boxes, labels)

        if rescale:
            boxes = scale_boxes(boxes, 1.0 / scale_factor)
        if cfg.min_bbox_size >= 0:
            w = boxes[:, 2] - boxes[:, 0]
            h = boxes[:, 3] - boxes[:, 1]
            valid = valid & (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)

        out_boxes, out_scores, out_labels, out_mask = nms_select_cfg(
            boxes, scores, labels, cfg, valid_mask=valid)
        return DetResults(bboxes=out_boxes, scores=out_scores,
                          labels=out_labels, mask=out_mask)

    # split flattened level maps per image via vmap over leading batch axis
    cls_by_lvl = [m.reshape(b, -1, m.shape[-1]) for m in cls_scores_lvl]
    reg_by_lvl = [m.reshape(b, -1, m.shape[-1]) for m in bbox_preds_lvl]
    return jax.vmap(single)(cls_by_lvl, reg_by_lvl, meta.img_shape,
                            meta.scale_factor)
