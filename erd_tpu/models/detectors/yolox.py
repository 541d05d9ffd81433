"""YOLOX detector: CSPDarknet + CSP-PAFPN + decoupled head + SimOTA.

Behavioural mirror of /root/reference/mmdet/models/detectors/yolox.py +
dense_heads/yolox_head.py + necks/yolox_pafpn.py (yolox_s layout): decoupled
cls/reg/obj branches on three levels (strides 8/16/32), grid+exp box coding,
SimOTA assignment, BCE cls (IoU-soft targets) + BCE objectness + IoU box
loss. Train-time BatchNorm threads through ``loss_and_state``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import cast_compute_params
from ...losses import binary_cross_entropy_with_logits, iou_loss
from ...ops import cap_candidates, filter_scores_and_topk, nms_select
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task import sim_ota_assign
from ..backbones.csp_darknet import CSPDarknet, CSPLayer, ConvBNSiLU
from ..heads.gfl_head import GFLTestConfig
from ..layers import nearest_upsample_to
from ..preprocessor import Preprocessor

YOLOX_STRIDES = (8, 16, 32)


class YOLOXPAFPN(nn.Module):
    channels: int = 128  # yolox-s head width
    num_csp_blocks: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats  # fine -> coarse, widths (128, 256, 512) @ s
        # top-down
        p5 = ConvBNSiLU(c4.shape[-1], 1, name='reduce1')(c5, train)
        u = nearest_upsample_to(p5, c4.shape[-3:-1])
        p4 = CSPLayer(c4.shape[-1], self.num_csp_blocks, shortcut=False,
                      name='td_csp1')(jnp.concatenate([u, c4], -1), train)
        p4r = ConvBNSiLU(c3.shape[-1], 1, name='reduce2')(p4, train)
        u = nearest_upsample_to(p4r, c3.shape[-3:-1])
        p3 = CSPLayer(c3.shape[-1], self.num_csp_blocks, shortcut=False,
                      name='td_csp2')(jnp.concatenate([u, c3], -1), train)
        # bottom-up
        d3 = ConvBNSiLU(c3.shape[-1], 3, stride=2, name='down1')(p3, train)
        n4 = CSPLayer(c4.shape[-1], self.num_csp_blocks, shortcut=False,
                      name='bu_csp1')(jnp.concatenate([d3, p4r], -1), train)
        d4 = ConvBNSiLU(c4.shape[-1], 3, stride=2, name='down2')(n4, train)
        n5 = CSPLayer(c5.shape[-1], self.num_csp_blocks, shortcut=False,
                      name='bu_csp2')(jnp.concatenate([d4, p5], -1), train)
        return (p3, n4, n5)


class YOLOXHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 128
    num_levels: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, x in enumerate(feats):
            y = ConvBNSiLU(self.feat_channels, 1,
                           name=f'stem_{i}')(x, train)
            c = y
            r = y
            for j in range(2):
                c = ConvBNSiLU(self.feat_channels, 3,
                               name=f'cls_conv_{i}_{j}')(c, train)
                r = ConvBNSiLU(self.feat_channels, 3,
                               name=f'reg_conv_{i}_{j}')(r, train)
            cls = nn.Conv(self.num_classes, (1, 1),
                          name=f'cls_pred_{i}')(c)
            reg = nn.Conv(4, (1, 1), name=f'reg_pred_{i}')(r)
            obj = nn.Conv(1, (1, 1), name=f'obj_pred_{i}')(r)
            outs.append(jnp.concatenate(
                [reg, obj, cls], axis=-1).astype(jnp.float32))
        return outs


class YOLOXNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32
    # size ladder (reference configs/yolox/yolox_{tiny,s,m,l,x}_*.py:
    # deepen_factor/widen_factor on the backbone; the PAFPN block count
    # and head width follow them): tiny (0.33, 0.375), s (0.33, 0.5),
    # m (0.67, 0.75), l (1.0, 1.0), x (1.33, 1.25)
    deepen: float = 0.33
    widen: float = 0.5

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = CSPDarknet(deepen=self.deepen, widen=self.widen,
                           compute_dtype=self.compute_dtype,
                           name='backbone')(images, train)
        feats = YOLOXPAFPN(num_csp_blocks=max(round(3 * self.deepen), 1),
                           name='neck')(feats, train)
        return YOLOXHeadNet(num_classes=self.num_classes,
                            feat_channels=max(int(256 * self.widen), 16),
                            name='bbox_head')(feats, train)


@dataclass(frozen=True)
class YOLOXContext:
    image_shape: Tuple[int, int]
    num_level_points: Tuple[int, ...]
    points: np.ndarray   # (N, 2) grid cell centers * stride
    strides: np.ndarray  # (N,)

    @staticmethod
    def build(image_shape):
        import math
        pts, strides, counts = [], [], []
        for s in YOLOX_STRIDES:
            h = math.ceil(image_shape[0] / s)
            w = math.ceil(image_shape[1] / s)
            xs = (np.arange(w, dtype=np.float32) + 0.5) * s
            ys = (np.arange(h, dtype=np.float32) + 0.5) * s
            gx, gy = np.meshgrid(xs, ys)
            pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
            strides.append(np.full(h * w, s, np.float32))
            counts.append(h * w)
        return YOLOXContext(image_shape=tuple(image_shape),
                            num_level_points=tuple(counts),
                            points=np.concatenate(pts),
                            strides=np.concatenate(strides))


def yolox_decode(ctx: YOLOXContext, preds):
    """(B, N, 5+C) raw [xy, wh, obj, cls] -> (boxes, obj_prob, cls_prob)."""
    pts = jnp.asarray(ctx.points)[None]
    strides = jnp.asarray(ctx.strides)[None, :, None]
    # grid offset form: center = (raw_xy * stride) + grid_center
    xy = preds[..., 0:2] * strides + pts
    wh = jnp.exp(jnp.clip(preds[..., 2:4], -20, 10)) * strides
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return boxes, jax.nn.sigmoid(preds[..., 4]), \
        jax.nn.sigmoid(preds[..., 5:])


@dataclass
class YOLOXDetector:
    num_classes: int = 80
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.01,
                                              iou_threshold=0.65))
    l1_loss_weight: float = 0.0  # enabled in the last epochs by recipes
    deepen: float = 0.33  # yolox-s; see YOLOXNet for the size ladder
    widen: float = 0.5

    def __post_init__(self):
        self.net = YOLOXNet(num_classes=self.num_classes,
                            deepen=self.deepen, widen=self.widen,
                            compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], YOLOXContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape) -> YOLOXContext:
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

    def _flatten(self, preds_lvl):
        b = preds_lvl[0].shape[0]
        return jnp.concatenate(
            [m.reshape(b, -1, m.shape[-1]) for m in preds_lvl], axis=1)

    def loss_and_state(self, variables, batch, teacher_variables=None):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        preds_lvl, new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        preds = self._flatten(preds_lvl)
        losses = yolox_flat_loss(ctx, preds, batch['gt'],
                                 self.num_classes, self.l1_loss_weight)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        preds = self._flatten(self.forward_raw(variables, images))
        boxes, obj_p, cls_p = yolox_decode(ctx, preds)

        def single(b_i, o_i, c_i, img_shape, scale_factor):
            scores = c_i * o_i[:, None]
            k = min(self.test_cfg.nms_pre,
                    scores.shape[0] * scores.shape[1])
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, self.test_cfg.score_thr, k)
            sel = b_i[top_idx]
            h, w = img_shape[0], img_shape[1]
            sel = jnp.clip(sel, 0, jnp.stack([w, h, w, h]).astype(
                sel.dtype))
            top_s, mask, sel, top_lab = cap_candidates(
                top_s, mask, self.test_cfg.pre_nms_total, sel, top_lab)
            if rescale:
                sel = scale_boxes(sel, 1.0 / scale_factor)
            ob, os_, ol, om = nms_select(sel, top_s, top_lab,
                                         self.test_cfg.iou_threshold,
                                         self.test_cfg.max_per_img,
                                         valid_mask=mask)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(boxes, obj_p, cls_p,
                                batch['meta'].img_shape,
                                batch['meta'].scale_factor)


def yolox_flat_loss(ctx: YOLOXContext, preds, gt, num_classes,
                    l1_loss_weight=0.0):
    """YOLOX loss over level-flattened raw head outputs (B, N, 5+C).

    Mirrors yolox_head.py:399-517 loss_by_feat + _get_targets_single:
    SimOTA assignment on sqrt(cls*obj) scores, BCE cls against
    onehot*IoU at positives, dense BCE objectness, 'square' IoU box
    loss x5, optional raw-parameterization L1 — every term summed over
    the batch and divided by the batch-total positive count.
    """
    boxes, obj_p, cls_p = yolox_decode(ctx, preds)
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)

    def single(pred_i, boxes_i, score_i, gt_b, gt_l, gt_m):
        # assignment scores are cls_prob * objectness (yolox_head.py:582
        # feeds sqrt(cls*obj); the sqrt lives inside sim_ota_assign)
        res = sim_ota_assign(pts, strides,
                             jax.lax.stop_gradient(boxes_i),
                             jax.lax.stop_gradient(score_i),
                             gt_b, gt_l, gt_m)
        pos = res.pos_mask
        tgt_boxes = gt_b[res.gt_idx]
        ious = bbox_overlaps(jax.lax.stop_gradient(boxes_i), tgt_boxes,
                             is_aligned=True)
        # cls: BCE against onehot * iou at positives
        onehot = jax.nn.one_hot(jnp.where(pos, res.labels, 0),
                                num_classes)
        cls_t = onehot * jnp.where(pos, ious, 0.0)[:, None]
        bce_cls = binary_cross_entropy_with_logits(
            pred_i[:, 5:], cls_t).sum(-1)
        l_cls = (bce_cls * pos).sum()
        # objectness: dense BCE
        bce_obj = binary_cross_entropy_with_logits(
            pred_i[:, 4], pos.astype(jnp.float32))
        l_obj = bce_obj.sum()
        # box: IoU loss at positives
        lb = iou_loss(boxes_i, tgt_boxes, mode='square',
                      reduction='none')
        l_box = 5.0 * (lb * pos).sum()
        # last-epochs L1 on the RAW parameterization (yolox_head.py
        # use_l1, enabled by YOLOXModeSwitchHook): t_xy =
        # (gt_center - grid_center)/stride, t_wh = log(gt_wh/stride)
        l_l1 = jnp.asarray(0.0, jnp.float32)
        if l1_loss_weight > 0:
            gt_c = (tgt_boxes[:, :2] + tgt_boxes[:, 2:]) / 2
            gt_wh = jnp.clip(tgt_boxes[:, 2:] - tgt_boxes[:, :2],
                             1e-3, None)
            t_xy = (gt_c - pts) / strides[:, None]
            t_wh = jnp.log(gt_wh / strides[:, None])
            t = jnp.concatenate([t_xy, t_wh], axis=-1)
            l1 = jnp.abs(pred_i[:, :4] - t).sum(-1)
            l_l1 = l1_loss_weight * (l1 * pos).sum()
        return l_cls, l_obj, l_box, l_l1, pos.sum()

    l_cls, l_obj, l_box, l_l1, n_pos = jax.vmap(single)(
        preds, boxes, cls_p * obj_p[..., None], gt.bboxes, gt.labels,
        gt.mask)
    # reference yolox_head.py:475-494: every term is a SUM over the
    # whole batch divided by the batch-TOTAL positive count
    # (num_total_samples = max(reduce_mean(num_pos), 1); under SPMD
    # the global-sum/global-count form is DDP-equivalent, see
    # gfl_head.py) — NOT a per-image mean
    denom = jnp.maximum(n_pos.sum().astype(jnp.float32), 1.0)
    losses = dict(loss_cls=l_cls.sum() / denom,
                  loss_obj=l_obj.sum() / denom,
                  loss_bbox=l_box.sum() / denom)
    if l1_loss_weight > 0:
        losses['loss_l1_bbox'] = l_l1.sum() / denom
    return losses
