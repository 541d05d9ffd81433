"""VarifocalNet (VFNet) head: IoU-aware cls + star-shaped DCN refinement.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/vfnet_head.py:

* initial distances: exp(scale(conv)) * reg_denom (bbox_norm_type
  'reg_denom', :276-283; denoms 64/128/256/512/1024 per level);
* star_dcn_offset (:307-347): the 9 points of a 3x3 deform conv are pinned
  to the predicted box's corners/edge-midpoints (feature scale, gradient
  multiplier 0.1 on the box branch), shared by the reg-refine and cls
  deform convs;
* refined distances = exp(scale_refine(conv(relu(dconv)))) *
  stop_grad(initial) (:290-296);
* loss (:349-…): ATSS assignment on 8x-stride square anchors (use_atss),
  GIoU on initial (weight 1.5) and refined (weight 2.0) boxes, each
  weighted by its own detached IoU-to-target with batch-summed avg
  factors, and Varifocal cls loss against IoU-of-refined targets with
  avg = global num_pos (sync_num_pos == implicit SPMD sum).

The deform sampling rides ops.deform_conv.deform_conv2d (one MXU GEMM per
level); all dynamic indexing is dense-masked.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss, varifocal_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...ops.deform_conv import deform_conv2d
from ...structures import DetResults, distance2bbox
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task.atss import atss_assign
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad
from .gfl_head import GFLTestConfig

STRIDES = (8, 16, 32, 64, 128)
REG_DENOMS = (64, 128, 256, 512, 1024)
INF = 1e8

# 3x3 kernel-relative base grid, row-major (ky, kx) in {-1, 0, 1}
_BASE = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                 -1).reshape(9, 2).astype(np.float32)


def star_offsets(bbox_pred, stride, gradient_mul=0.1):
    """(B, H, W, 4) distances (image units) -> (B, H, W, 1, 9, 2) offsets.

    Places the 9 sampling points at the predicted box's corners and edge
    midpoints, expressed as offsets from the deform conv's base grid.
    """
    bp = (1.0 - gradient_mul) * jax.lax.stop_gradient(bbox_pred) + \
        gradient_mul * bbox_pred
    bp = bp / stride
    x1, y1, x2, y2 = bp[..., 0], bp[..., 1], bp[..., 2], bp[..., 3]
    zero = jnp.zeros_like(x1)
    ys = jnp.stack([-y1, -y1, -y1, zero, zero, zero, y2, y2, y2], -1)
    xs = jnp.stack([-x1, zero, x2, -x1, zero, x2, -x1, zero, x2], -1)
    star = jnp.stack([ys, xs], -1)  # (B,H,W,9,2)
    off = star - jnp.asarray(_BASE)[None, None, None]
    return off[:, :, :, None, :, :]  # deform_groups=1


class VFNetHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 3
    num_levels: int = 5
    gradient_mul: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == self.num_levels
        cls_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_conv_init = ConvModule(self.feat_channels, 3, norm='gn',
                                   name='vfnet_reg_conv')
        dtype = feats[0].dtype
        vfnet_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            dtype=dtype, name='vfnet_reg')
        vfnet_reg_refine = nn.Conv(
            4, (3, 3), padding=[torch_pad(3)] * 2,
            kernel_init=nn.initializers.normal(0.01), dtype=dtype,
            name='vfnet_reg_refine')
        vfnet_cls = nn.Conv(self.num_classes, (3, 3),
                            padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=bias_init_prob(0.01), dtype=dtype,
                            name='vfnet_cls')
        refine_dconv_w = self.param(
            'reg_refine_dconv_kernel', nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        cls_dconv_w = self.param(
            'cls_dconv_kernel', nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]
        scales_refine = [Scale(1.0, name=f'scale_refine_{i}')
                         for i in range(self.num_levels)]

        cls_scores, bbox_inis, bbox_refines = [], [], []
        for lvl, x in enumerate(feats):
            stride = STRIDES[lvl]
            cls_feat = x
            reg_feat = x
            for conv in cls_convs:
                cls_feat = conv(cls_feat)
            for conv in reg_convs:
                reg_feat = conv(reg_feat)

            reg_init_feat = reg_conv_init(reg_feat)
            bbox_pred = jnp.exp(scales[lvl](
                vfnet_reg(reg_init_feat).astype(jnp.float32))) * \
                REG_DENOMS[lvl]

            offsets = star_offsets(bbox_pred, stride, self.gradient_mul)
            offsets = offsets.astype(jnp.float32)
            rw = refine_dconv_w.astype(reg_feat.dtype)
            cw = cls_dconv_w.astype(cls_feat.dtype)
            dconv = jax.vmap(
                lambda xi, oi, w=rw: deform_conv2d(xi, oi, w))
            reg_ref_feat = nn.relu(dconv(reg_feat, offsets))
            refine = jnp.exp(scales_refine[lvl](
                vfnet_reg_refine(reg_ref_feat).astype(jnp.float32)))
            bbox_refine = refine * jax.lax.stop_gradient(bbox_pred)

            cls_dconv = jax.vmap(
                lambda xi, oi, w=cw: deform_conv2d(xi, oi, w))
            cls_feat = nn.relu(cls_dconv(cls_feat, offsets))
            cls_scores.append(vfnet_cls(cls_feat).astype(jnp.float32))
            bbox_inis.append(bbox_pred)
            bbox_refines.append(bbox_refine)
        return cls_scores, bbox_inis, bbox_refines


@dataclass(frozen=True)
class VFNetContext:
    image_shape: Tuple[int, int]
    num_level_points: Tuple[int, ...]
    points: np.ndarray   # (N, 2)
    strides: np.ndarray  # (N,)
    anchors: np.ndarray  # (N, 4) 8x-stride squares for ATSS assignment

    @staticmethod
    def build(image_shape, octave_base_scale=8):
        import math
        pts, strides, anchors, counts = [], [], [], []
        for s in STRIDES:
            h = math.ceil(image_shape[0] / s)
            w = math.ceil(image_shape[1] / s)
            # anchor_center_offset 0.0 for VFNet's fcos grid (:176-181)
            xs = np.arange(w, dtype=np.float32) * s + s / 2.0
            ys = np.arange(h, dtype=np.float32) * s + s / 2.0
            gx, gy = np.meshgrid(xs, ys)
            p = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            pts.append(p)
            strides.append(np.full(len(p), s, np.float32))
            half = octave_base_scale * s / 2.0
            anchors.append(np.concatenate([p - half, p + half], -1))
            counts.append(len(p))
        return VFNetContext(image_shape=tuple(image_shape),
                            num_level_points=tuple(counts),
                            points=np.concatenate(pts),
                            strides=np.concatenate(strides),
                            anchors=np.concatenate(anchors))


def vfnet_loss(ctx: VFNetContext, cls_scores, bbox_ini, bbox_refine, gt,
               num_classes, topk=9):
    """cls_scores logits (B,N,C); boxes decoded xyxy image units."""
    pts = jnp.asarray(ctx.points)

    def single(cls_s, box_i, box_r, gt_b, gt_l, gt_m):
        res = atss_assign(jnp.asarray(ctx.anchors), ctx.num_level_points,
                          gt_b, gt_l, gt_m, topk=topk)
        pos = res.pos_mask
        tgt = gt_b[res.gt_idx]
        iou_ini = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(box_i), tgt, is_aligned=True), 0.0)
        iou_ini = jnp.clip(iou_ini, 0.0, None)
        iou_rf = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(box_r), tgt, is_aligned=True), 0.0)
        iou_rf = jnp.clip(iou_rf, 0.0, None)

        lb_ini = giou_loss(box_i, tgt, reduction='none')
        lb_rf = giou_loss(box_r, tgt, reduction='none')
        l_ini = (lb_ini * iou_ini).sum()
        l_rf = (lb_rf * iou_rf).sum()

        # IoU-aware varifocal targets at the assigned class
        onehot = jax.nn.one_hot(jnp.where(pos, res.labels, 0), num_classes)
        vfl_target = onehot * iou_rf[:, None] * pos[:, None]
        l_cls = varifocal_loss(cls_s, vfl_target, reduction='sum')
        return (l_cls, l_ini, l_rf, iou_ini.sum(), iou_rf.sum(),
                pos.sum().astype(jnp.float32))

    l_cls, l_ini, l_rf, af_ini, af_rf, n_pos = jax.vmap(single)(
        cls_scores, bbox_ini, bbox_refine, gt.bboxes, gt.labels, gt.mask)
    num_pos = jnp.maximum(n_pos.sum(), 1.0)
    return {
        'loss_cls': l_cls.sum() / num_pos,
        'loss_bbox': 1.5 * l_ini.sum() / jnp.maximum(af_ini.sum(), 1.0),
        'loss_bbox_rf': 2.0 * l_rf.sum() / jnp.maximum(af_rf.sum(), 1.0),
    }


def vfnet_predict(ctx: VFNetContext, cls_lvl, box_lvl, meta,
                  cfg: GFLTestConfig, num_classes, rescale=True):
    """Refined boxes arrive decoded as distances? No: decoded xyxy via the
    forward's per-level distance2bbox in the detector; here boxes are
    already xyxy in image units (B,H,W,4 flattened per level)."""
    b = cls_lvl[0].shape[0]

    def single(cls_by_lvl, box_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            n_l = ctx.num_level_points[lvl]
            scores = jax.nn.sigmoid(cls_by_lvl[lvl])
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            bx = box_by_lvl[lvl][top_idx]
            bx = jnp.clip(
                bx, 0.0,
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


def decode_levels(ctx: VFNetContext, dist_lvl):
    """Per-level (B,H,W,4) ltrb distances -> xyxy boxes at grid points."""
    out = []
    start = 0
    for lvl, d in enumerate(dist_lvl):
        b, h, w, _ = d.shape
        n_l = ctx.num_level_points[lvl]
        pts = jnp.asarray(ctx.points[start:start + n_l]).reshape(h, w, 2)
        out.append(distance2bbox(pts[None], d))
        start += n_l
    return out
