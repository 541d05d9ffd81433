"""Dynamic R-CNN: label-assignment and loss-shape adaptation.

Behavioural mirror of
/root/reference/mmdet/models/roi_heads/dynamic_roi_head.py +
configs/dynamic_rcnn/dynamic-rcnn_r50_fpn_1x_coco.py: the RCNN stage's
positive-IoU threshold tracks the ``iou_topk``(=75)-th best proposal IoU
per gt (averaged over images), and the SmoothL1 beta tracks the
``beta_topk``(=10)-th smallest positive regression error, both clipped at
the static initial values (IoU >= 0.4 floor... reference uses
initial_iou=0.4 as the floor via max(), initial_beta=1.0 as the ceiling
via min()).

Documented deviation: the reference updates the thresholds every 100
iterations from a python-side record list; under jit the same statistics
are computed from the CURRENT global batch each step (the SPMD-friendly
stateless form — with batch >= 8 images the estimate matches the
100-iter window closely).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...losses import cross_entropy_int
from ...structures.boxes import bbox_overlaps
from ...task.max_iou import max_iou_assign
from ...task.samplers import random_sample
from ..heads.bbox_head import RoISamples
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector


@dataclass
class DynamicRCNNDetector(FasterRCNNDetector):
    initial_iou: float = 0.4
    iou_topk: int = 75
    initial_beta: float = 1.0
    beta_topk: int = 10

    def __post_init__(self):
        super().__post_init__()
        self.loss_jit = jax.jit(self.loss)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                          batch['meta'].img_shape, rng, self.rpn_coder,
                          self.rpn_train_cfg)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)

        # ---- dynamic IoU threshold from the current batch ----
        def kth_iou(p, pm, gb, gm):
            iou = bbox_overlaps(p, gb)            # (P, G)
            iou = jnp.where(pm[:, None] & gm[None, :], iou, 0.0)
            k = min(self.iou_topk, iou.shape[0])
            top = jax.lax.top_k(iou.T, k)[0][:, -1]     # (G,) kth best
            return jnp.where(gm, top, 0.0).sum(), gm.sum()

        ks, ng = jax.vmap(kth_iou)(prop_boxes, prop_mask,
                                   batch['gt'].bboxes, batch['gt'].mask)
        dyn_iou = jnp.maximum(self.initial_iou,
                              ks.sum() / jnp.maximum(ng.sum(), 1.0))

        cfg = self.rcnn_train_cfg

        def sample_single(k, p, pm, gb, gl, gm):
            if cfg.add_gt_as_proposals:
                p = jnp.concatenate([gb, p])
                pm = jnp.concatenate([gm, pm])
            res = max_iou_assign(p, gb, gl, gm, pos_iou_thr=dyn_iou,
                                 neg_iou_thr=dyn_iou, min_pos_iou=dyn_iou,
                                 match_low_quality=False, valid_flags=pm)
            neg_mask = (~res.pos_mask) & (res.labels != -2) & pm
            smp = random_sample(k, res.pos_mask & pm, neg_mask,
                                num=cfg.num_samples,
                                pos_fraction=cfg.pos_fraction)
            rois = p[smp.idx]
            labels = jnp.where(smp.is_pos & smp.valid,
                               res.labels[smp.idx], self.num_classes)
            deltas = self.rcnn_coder.encode(rois, gb[res.gt_idx[smp.idx]])
            deltas = jnp.nan_to_num(deltas, nan=0.0, posinf=0.0,
                                    neginf=0.0)
            return RoISamples(rois=rois, labels=labels.astype(jnp.int32),
                              deltas=deltas,
                              is_pos=smp.is_pos & smp.valid,
                              valid=smp.valid,
                              gt_idx=res.gt_idx[smp.idx])

        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(sample_single)(
            rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
            batch['gt'].labels, batch['gt'].mask)

        from ...ops.roi_align import multilevel_roi_align
        s = samples.rois.shape[1]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        cls_logits = cls_logits.astype(jnp.float32)
        reg_preds = reg_preds.astype(jnp.float32)

        labels = samples.labels.reshape(-1)
        valid = samples.valid.reshape(-1)
        is_pos = samples.is_pos.reshape(-1)
        n_valid = jnp.maximum(valid.sum(), 1.0)
        ce = cross_entropy_int(cls_logits, labels)
        losses['loss_cls'] = (ce * valid).sum() / n_valid

        r = reg_preds.reshape(reg_preds.shape[0], -1, 4)
        safe = jnp.clip(labels, 0, r.shape[1] - 1)
        reg_at = jnp.take_along_axis(
            r, safe[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
        err = jnp.abs(reg_at - samples.deltas.reshape(-1, 4))
        # dynamic beta: beta_topk-th smallest positive error (per coord
        # mean), floored for stability and capped at initial_beta
        pos_err = jnp.where(is_pos[:, None], err, jnp.inf).mean(-1)
        k = min(self.beta_topk * max(1, b), pos_err.shape[0])
        kth = -jax.lax.top_k(-pos_err, k)[0][-1]
        dyn_beta = jnp.clip(kth, 1e-3, self.initial_beta)
        sl1 = jnp.where(err < dyn_beta,
                        0.5 * err * err / dyn_beta, err - 0.5 * dyn_beta)
        losses['loss_bbox'] = (sl1.sum(-1) * is_pos).sum() / n_valid
        return losses
