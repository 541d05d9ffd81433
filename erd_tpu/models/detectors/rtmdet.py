"""RTMDet detector: CSPNeXt backbone + shared-conv separated-BN head +
dynamic soft-label assignment.

Behavioural mirror of /root/reference/mmdet/models/detectors/rtmdet.py +
dense_heads/rtmdet_head.py + backbones/cspnext.py (rtmdet-s layout):
CSPNeXt blocks (3x3 conv + 5x5 depthwise), SiLU + train-time BN, a head
whose conv KERNELS are shared across the three levels while each level keeps
its own BN statistics (exp_on_reg off: reg scaled by stride), QFL-style soft
classification targets = IoU of the assigned box, GIoU box loss, and a
DynamicSoftLabelAssigner (SimOTA-style dynamic-k over a soft-label cost).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import cast_compute_params
from ...losses import giou_loss, quality_focal_loss_tensor_target
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults, distance2bbox
from ...structures.boxes import bbox_overlaps, scale_boxes
from ..backbones.csp_darknet import ConvBNSiLU, CSPLayer, SPPBottleneck
from ..heads.gfl_head import GFLTestConfig
from ..layers import nearest_upsample_to, torch_pad
from ..preprocessor import Preprocessor
from .yolox import YOLOXContext  # same stride-(8,16,32) point grid

INF = 1e8


class CSPNeXtBlock(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.features, 3, name='conv1')(x, train)
        # 5x5 depthwise conv (the CSPNeXt signature op)
        y = nn.Conv(self.features, (5, 5), padding=[torch_pad(5)] * 2,
                    feature_group_count=self.features, use_bias=False,
                    name='dwconv')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name='dwbn')(y)
        y = nn.silu(y)
        return x + y if self.shortcut and x.shape[-1] == self.features \
            else y


class CSPNeXtLayer(nn.Module):
    features: int
    num_blocks: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        a = ConvBNSiLU(mid, 1, name='main_conv')(x, train)
        b = ConvBNSiLU(mid, 1, name='short_conv')(x, train)
        for i in range(self.num_blocks):
            a = CSPNeXtBlock(mid, self.shortcut,
                             name=f'block{i}')(a, train)
        return ConvBNSiLU(self.features, 1, name='final_conv')(
            jnp.concatenate([a, b], axis=-1), train)


class CSPNeXt(nn.Module):
    deepen: float = 0.33  # rtmdet-s
    widen: float = 0.5
    out_indices: Tuple[int, ...] = (2, 3, 4)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(c * self.widen), 16)

        def d(n):
            return max(round(n * self.deepen), 1)

        x = x.astype(self.compute_dtype)
        # 3-conv stem (stride 2 total)
        x = ConvBNSiLU(w(64) // 2, 3, stride=2, name='stem0')(x, train)
        x = ConvBNSiLU(w(64) // 2, 3, name='stem1')(x, train)
        x = ConvBNSiLU(w(64), 3, name='stem2')(x, train)
        outs = []
        cfg = [(w(128), d(3), False), (w(256), d(6), False),
               (w(512), d(6), False), (w(1024), d(3), True)]
        for i, (ch, nb, spp) in enumerate(cfg, start=1):
            x = ConvBNSiLU(ch, 3, stride=2, name=f'stage{i}_down')(x, train)
            if spp:
                x = SPPBottleneck(ch, name=f'stage{i}_spp')(x, train)
            x = CSPNeXtLayer(ch, nb, shortcut=not spp,
                             name=f'stage{i}_csp')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class RTMDetHeadNet(nn.Module):
    """Shared conv kernels across levels; per-level BatchNorm."""
    num_classes: int
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[torch_pad(3)] * 2, use_bias=False,
                             name=f'cls_conv_{j}')
                     for j in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[torch_pad(3)] * 2, use_bias=False,
                             name=f'reg_conv_{j}')
                     for j in range(self.stacked_convs)]
        rtm_cls = nn.Conv(self.num_classes, (1, 1), name='rtm_cls')
        rtm_reg = nn.Conv(4, (1, 1), name='rtm_reg')
        outs_cls, outs_reg = [], []
        for i, x in enumerate(feats):
            c = x
            r = x
            for j in range(self.stacked_convs):
                c = nn.silu(nn.BatchNorm(use_running_average=not train,
                                         momentum=0.97, epsilon=1e-3,
                                         name=f'cls_bn_{i}_{j}')(
                    cls_convs[j](c)))
                r = nn.silu(nn.BatchNorm(use_running_average=not train,
                                         momentum=0.97, epsilon=1e-3,
                                         name=f'reg_bn_{i}_{j}')(
                    reg_convs[j](r)))
            outs_cls.append(rtm_cls(c).astype(jnp.float32))
            outs_reg.append(rtm_reg(r).astype(jnp.float32))
        return outs_cls, outs_reg


class CSPNeXtPAFPN(nn.Module):
    """CSP-PAFPN neck over (c3, c4, c5), projected to a common width
    (c3's channel count). Shared by RTMDet and RTMDet-Ins.

    ``num_csp_blocks`` follows the size ladder (round(3 * deepen) in the
    reference configs; 1 for the -s default)."""
    num_csp_blocks: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        nb = self.num_csp_blocks
        p5 = ConvBNSiLU(c4.shape[-1], 1, name='reduce1')(c5, train)
        u = nearest_upsample_to(p5, c4.shape[-3:-1])
        p4 = CSPNeXtLayer(c4.shape[-1], nb, shortcut=False,
                          name='td_csp1')(jnp.concatenate([u, c4], -1),
                                          train)
        p4r = ConvBNSiLU(c3.shape[-1], 1, name='reduce2')(p4, train)
        u = nearest_upsample_to(p4r, c3.shape[-3:-1])
        p3 = CSPNeXtLayer(c3.shape[-1], nb, shortcut=False,
                          name='td_csp2')(jnp.concatenate([u, c3], -1),
                                          train)
        d3 = ConvBNSiLU(c3.shape[-1], 3, stride=2, name='down1')(p3, train)
        n4 = CSPNeXtLayer(c4.shape[-1], nb, shortcut=False,
                          name='bu_csp1')(jnp.concatenate([d3, p4r], -1),
                                          train)
        d4 = ConvBNSiLU(c4.shape[-1], 3, stride=2, name='down2')(n4, train)
        n5 = CSPNeXtLayer(c5.shape[-1], nb, shortcut=False,
                          name='bu_csp2')(jnp.concatenate([d4, p5], -1),
                                          train)
        width = c3.shape[-1]
        return [ConvBNSiLU(width, 1, name=f'out_conv{i}')(f, train)
                for i, f in enumerate((p3, n4, n5))]


class RTMDetNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32
    # size ladder (reference configs/rtmdet/rtmdet_{tiny,s,m,l,x}_*.py):
    # tiny (0.167, 0.375), s (0.33, 0.5), m (0.67, 0.75), l (1.0, 1.0),
    # x (1.33, 1.25); neck block count and head width follow
    deepen: float = 0.33
    widen: float = 0.5

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = CSPNeXt(deepen=self.deepen, widen=self.widen,
                        compute_dtype=self.compute_dtype,
                        name='backbone')(images, train)
        levels = CSPNeXtPAFPN(num_csp_blocks=max(round(3 * self.deepen), 1),
                              name='neck')(feats, train)
        return RTMDetHeadNet(num_classes=self.num_classes,
                             feat_channels=levels[0].shape[-1],
                             name='bbox_head')(levels, train)


def dynamic_soft_label_assign(points, strides, decoded, cls_probs,
                              gt_bboxes, gt_labels, gt_mask,
                              topk=13, iou_weight=3.0,
                              soft_center_radius=3.0):
    """DynamicSoftLabelAssigner: SimOTA-style dynamic-k over soft-label cost.

    Mirrors /root/reference/mmdet/models/task_modules/assigners/
    dynamic_soft_label_assigner.py (differential-tested in
    tests/test_assigner_oracle.py): candidates are priors strictly inside
    ANY gt box (:126-131); every candidate competes for every gt with
    cost = sum-over-classes |soft - p|^2-scaled BCE(p, soft), where
    soft = onehot(gt) * IoU (:157-165), plus 3 * -log(IoU + 1e-7) and the
    soft center prior 10^(center_dist/stride - 3) (:147-151); per-gt
    dynamic-k = int(sum of top-13 candidate IoUs) >= 1; conflicts keep the
    lowest-cost gt.
    """
    n = points.shape[0]
    eps = 1e-7
    ious = bbox_overlaps(decoded, gt_bboxes)  # (N, G)
    x, y = points[:, 0:1], points[:, 1:2]
    inside = (x > gt_bboxes[None, :, 0]) & (x < gt_bboxes[None, :, 2]) & \
             (y > gt_bboxes[None, :, 1]) & (y < gt_bboxes[None, :, 3])
    inside = inside[:, 0] if inside.ndim == 3 else inside
    valid_prior = (inside & gt_mask[None, :]).any(axis=1)  # (N,)
    live = valid_prior[:, None] & gt_mask[None, :]  # (N, G)

    # soft center prior: 10^(dist(prior, gt center)/stride - radius);
    # exponent clipped so far pairs stay finite and ordered below the
    # non-candidate sentinel
    gt_c = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2.0  # (G, 2)
    dist = jnp.sqrt(((points[:, None, :] - gt_c[None, :, :]) ** 2
                     ).sum(-1)) / jnp.maximum(strides[:, None], 1e-6)
    center_prior = 10.0 ** jnp.minimum(dist - soft_center_radius, 30.0)

    # cls cost summed over ALL classes with soft target onehot*iou: the
    # non-gt classes contribute p^2 * -log(1-p) independent of the gt
    p = jnp.clip(cls_probs, 0.0, 1.0)  # (N, C)
    neg_term = (p ** 2) * (-jnp.log(1.0 - p + 1e-12))  # (N, C)
    gl = jnp.clip(gt_labels, 0, cls_probs.shape[1] - 1)  # (G,)
    p_g = p[:, gl]  # (N, G)
    t = ious
    bce_pos = -(t * jnp.log(p_g + 1e-12) +
                (1.0 - t) * jnp.log(1.0 - p_g + 1e-12))
    cls_cost = (neg_term.sum(-1)[:, None] - neg_term[:, gl] +
                bce_pos * jnp.abs(t - p_g) ** 2.0)

    cost = cls_cost + iou_weight * (-jnp.log(ious + eps)) + center_prior
    cost = jnp.where(live, cost, 1e38)

    k = min(topk, n)
    topk_ious, _ = jax.lax.top_k(jnp.where(live, ious, 0.0).T, k)
    dynamic_k = jnp.clip(topk_ious.sum(axis=1).astype(jnp.int32), 1, None)
    order = jnp.argsort(cost.T, axis=1)
    ranks = jax.vmap(lambda o: jnp.zeros((n,), jnp.int32).at[o].set(
        jnp.arange(n, dtype=jnp.int32)))(order)
    # dynamic_k <= num_valid, so rank < dynamic_k always lands on live
    # entries for live gt columns; the & live kills padded-gt columns
    chosen = (ranks < dynamic_k[:, None]).T & live

    # chosen costs can exceed any fixed sentinel smaller than the live
    # mask's (center prior reaches 1e30), so flag positives off the mask
    cost_sel = jnp.where(chosen, cost, 1e38)
    gt_idx = cost_sel.argmin(axis=1).astype(jnp.int32)
    pos = chosen.any(axis=1)
    return pos, gt_idx, ious


@dataclass
class RTMDetDetector:
    num_classes: int = 80
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.05,
                                              iou_threshold=0.65))
    deepen: float = 0.33  # rtmdet-s; see RTMDetNet for the size ladder
    widen: float = 0.5

    def __post_init__(self):
        self.net = RTMDetNet(num_classes=self.num_classes,
                             deepen=self.deepen, widen=self.widen,
                             compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], YOLOXContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape):
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = YOLOXContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def _flatten(self, cls_lvl, reg_lvl):
        b = cls_lvl[0].shape[0]
        cls = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl], axis=1)
        reg = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        return cls, reg

    def _decode(self, ctx, reg):
        pts = jnp.asarray(ctx.points)[None]
        strides = jnp.asarray(ctx.strides)[None, :, None]
        # distances are predicted in stride units (exp_on_reg=False form)
        return distance2bbox(pts, jax.nn.relu(reg) * strides)

    def loss_and_state(self, variables, batch, teacher_variables=None):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        (cls_lvl, reg_lvl), new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        cls, reg = self._flatten(cls_lvl, reg_lvl)
        boxes = self._decode(ctx, reg)
        losses = rtmdet_flat_loss(ctx, cls, boxes, batch['gt'],
                                  self.num_classes)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        cls, reg = self._flatten(cls_lvl, reg_lvl)
        boxes = self._decode(ctx, reg)

        def single(c_i, b_i, img_shape, scale_factor):
            scores = jax.nn.sigmoid(c_i)
            k = min(self.test_cfg.nms_pre,
                    scores.shape[0] * scores.shape[1])
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, self.test_cfg.score_thr, k)
            sel = b_i[top_idx]
            h, w = img_shape[0], img_shape[1]
            sel = jnp.clip(sel, 0,
                           jnp.stack([w, h, w, h]).astype(sel.dtype))
            top_s, mask, sel, top_lab = cap_candidates(
                top_s, mask, self.test_cfg.pre_nms_total, sel, top_lab)
            if rescale:
                sel = scale_boxes(sel, 1.0 / scale_factor)
            ob, os_, ol, om = nms_select(sel, top_s, top_lab,
                                         self.test_cfg.iou_threshold,
                                         self.test_cfg.max_per_img,
                                         valid_mask=mask)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(cls, boxes, batch['meta'].img_shape,
                                batch['meta'].scale_factor)


def rtmdet_flat_loss(ctx, cls, boxes, gt, num_classes):
    """RTMDet loss over level-flattened cls logits (B, N, C) and DECODED
    boxes (B, N, 4).

    Mirrors rtmdet_head.py:151-288 loss_by_feat(+single): DynamicSoftLabel
    assignment, QFL against onehot*assign_metric soft targets, GIoU x2
    weighted per-positive by the assign metric; batch-global avg factors
    (cls by sum of assign metrics, bbox by sum of positive metrics, both
    clamped >= 1 — reduce_mean across devices ≡ the SPMD global-sum/
    global-count protocol, see gfl_head.py).
    """
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)

    def single(cls_i, boxes_i, gt_b, gt_l, gt_m):
        probs = jax.nn.sigmoid(jax.lax.stop_gradient(cls_i))
        pos, gt_idx, ious = dynamic_soft_label_assign(
            pts, strides, jax.lax.stop_gradient(boxes_i), probs,
            gt_b, gt_l, gt_m)
        tgt_boxes = gt_b[gt_idx]
        # assign_metrics = IoU(pred, matched gt) at positives
        # (dynamic_soft_label_assigner.py:182 matched_pred_ious)
        iou_t = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(boxes_i), tgt_boxes,
            is_aligned=True), 0.0)
        onehot = jax.nn.one_hot(jnp.where(pos, gt_l[gt_idx], 0),
                                num_classes)
        soft = onehot * iou_t[:, None]
        l_cls = quality_focal_loss_tensor_target(
            cls_i, soft, reduction='sum')
        # reference rtmdet_head.py:199-210: GIoU weighted per-positive
        # by the assign metric
        lb = giou_loss(boxes_i, tgt_boxes, reduction='none')
        l_box = 2.0 * (lb * iou_t * pos).sum()
        return l_cls, l_box, iou_t.sum(), (iou_t * pos).sum()

    l_cls, l_box, cls_af, box_af = jax.vmap(single)(
        cls, boxes, gt.bboxes, gt.labels, gt.mask)
    return dict(
        loss_cls=l_cls.sum() / jnp.maximum(cls_af.sum(), 1.0),
        loss_bbox=l_box.sum() / jnp.maximum(box_af.sum(), 1.0))
