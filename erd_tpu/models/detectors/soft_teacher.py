"""SoftTeacher: end-to-end semi-supervised detection (Faster R-CNN based).

Behavioural mirror of /root/reference/mmdet/models/detectors/soft_teacher.py
(+ semi_base.py), TPU-redesigned around the functional Faster R-CNN:

* teacher = EMA copy of the student (engine.ema drives the update, the
  reference's MeanTeacherHook); pseudo instances come from the teacher's
  full predict on the weak view, thresholded at
  ``pseudo_label_initial_score_thr`` (:88-112);
* regression pseudo-label filtering (:290-379): each pseudo box is
  jittered ``jitter_times`` times with N(0,1) * 0.06 * (w,h,w,h) offsets,
  the teacher's RCNN re-decodes every jitter, and the per-coordinate std
  normalized by the mean box extent gives the uncertainty; boxes with
  unc < ``reg_pseudo_thr`` keep their regression supervision;
* unsupervised losses on the strong view (:51-85): RPN loss on pseudo
  boxes >= ``rpn_pseudo_thr``; RCNN cls loss on pseudo boxes >=
  ``cls_pseudo_thr`` with SOFT BACKGROUND weights — negative RoIs are
  weighted by the teacher's background probability on those very RoIs and
  the loss renormalized by the weight sum (:224-257); RCNN reg loss only
  on low-uncertainty pseudo boxes (:259-289). All unsup terms scale by
  ``unsup_weight``.

Deviation (documented): the weak and strong unsup views must share
geometry (photometric-only strong augmentation, as data/strong_aug.py
produces) — the reference's homography projection between differently
warped views is the identity here, so no matrix plumbing is needed.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ...losses.utils import cross_entropy_int
from ...ops.roi_align import multilevel_roi_align
from ...structures import GTInstances
from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


@dataclass
class SemiTrainConfig:
    pseudo_label_initial_score_thr: float = 0.5
    rpn_pseudo_thr: float = 0.9
    cls_pseudo_thr: float = 0.9
    reg_pseudo_thr: float = 0.02
    jitter_times: int = 10
    jitter_scale: float = 0.06
    unsup_weight: float = 4.0
    max_pseudo: int = 32  # padded pseudo-gt capacity per image


@dataclass
class SoftTeacherDetector(FasterRCNNDetector):
    semi: SemiTrainConfig = field(default_factory=SemiTrainConfig)

    def __post_init__(self):
        super().__post_init__()
        self.semi_loss_jit = jax.jit(self.semi_loss)

    # -- teacher helpers -------------------------------------------------
    def _teacher_feats(self, teacher_variables, images):
        return self.net.apply(
            cast_compute_params(teacher_variables, self.compute_dtype),
            self.preprocessor(images), method=FasterRCNNNet.extract_feat)

    def _teacher_roi(self, teacher_variables, feats, rois):
        b, s = rois.shape[:2]
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(teacher_variables, self.compute_dtype),
            roi_feats.reshape(b * s, 7, 7, -1),
            method=FasterRCNNNet.roi_forward)
        return (cls_logits.astype(jnp.float32).reshape(b, s, -1),
                reg_preds.astype(jnp.float32).reshape(b, s, -1))

    def _pseudo_instances(self, teacher_variables, batch, rng):
        """Teacher predict -> padded pseudo GTInstances + reg uncertainty."""
        cfg = self.semi
        res = self.predict(teacher_variables, batch, rescale=False)
        keep = res.mask & \
            (res.scores >= cfg.pseudo_label_initial_score_thr)
        score = jnp.where(keep, res.scores, -1.0)
        _, idx = jax.lax.top_k(score, cfg.max_pseudo)  # (B, P)
        take = jax.vmap(lambda a, i: a[i])
        boxes = take(res.bboxes, idx)
        labels = take(res.labels, idx)
        valid = take(keep, idx)

        # jitter-based regression uncertainty (teacher re-decode)
        feats = self._teacher_feats(teacher_variables, batch['images'])
        b, p = boxes.shape[:2]
        wh = jnp.clip(boxes[..., 2:4] - boxes[..., 0:2], 1.0, None)
        scale4 = jnp.concatenate([wh, wh], -1) * cfg.jitter_scale
        noise = jax.random.normal(
            rng, (cfg.jitter_times, b, p, 4)) * scale4[None]
        jit_boxes = boxes[None] + noise  # (T, B, P, 4)
        jb = jit_boxes.transpose(1, 0, 2, 3).reshape(b,
                                                     cfg.jitter_times * p,
                                                     4)
        _, reg = self._teacher_roi(teacher_variables, feats, jb)
        reg = reg.reshape(b, cfg.jitter_times, p, -1, 4)
        safe = jnp.clip(labels, 0, reg.shape[3] - 1)  # (B, P)
        sel = jnp.broadcast_to(safe[:, None, :, None, None],
                               (b, cfg.jitter_times, p, 1, 4))
        reg_at = jnp.take_along_axis(reg, sel, axis=3)[:, :, :, 0]
        decoded = self.rcnn_coder.decode(
            jit_boxes.transpose(1, 0, 2, 3), reg_at)  # (B, T, P, 4)
        unc = decoded.std(axis=1)  # (B, P, 4)
        mean_box = decoded.mean(axis=1)
        mwh = jnp.clip(mean_box[..., 2:4] - mean_box[..., 0:2], 1.0, None)
        rel_unc = (unc / jnp.concatenate([mwh, mwh], -1)).mean(-1)
        return (GTInstances(bboxes=boxes, labels=labels, mask=valid),
                jnp.where(valid, res_scores_at(score, idx), 0.0), rel_unc)

    # -- the fused semi-supervised step ---------------------------------
    def semi_loss(self, variables, sup_batch, unsup_weak, unsup_strong,
                  teacher_variables=None):
        """Supervised + pseudo-label losses in one jitted step."""
        assert teacher_variables is not None
        cfg = self.semi
        t_vars = jax.lax.stop_gradient(teacher_variables)
        losses = {f'sup_{k}': v
                  for k, v in self.loss(variables, sup_batch).items()}

        rng = jax.random.fold_in(jax.random.PRNGKey(7),
                                 unsup_weak['meta'].img_id.sum())
        pseudo, pscore, rel_unc = self._pseudo_instances(
            t_vars, unsup_weak, rng)

        images = unsup_strong['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)

        # RPN on high-score pseudo boxes
        rpn_gt = pseudo.replace(mask=pseudo.mask &
                                (pscore >= cfg.rpn_pseudo_thr))
        rpn_losses = rpn_loss(ctx, cls_flat, reg_flat, rpn_gt,
                              unsup_strong['meta'].img_shape,
                              jax.random.fold_in(rng, 1), self.rpn_coder,
                              self.rpn_train_cfg)

        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            unsup_strong['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)

        # RCNN cls on cls-threshold pseudo boxes with soft backgrounds
        cls_gt_mask = pseudo.mask & (pscore >= cfg.cls_pseudo_thr)
        rngs = jax.random.split(jax.random.fold_in(rng, 2), b)
        samples = jax.vmap(
            lambda k, pbx, pm, gb, gl, gm: rcnn_sample_single(
                k, pbx, pm, gb, gl, gm, self.num_classes,
                self.rcnn_coder, self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, pseudo.bboxes, pseudo.labels,
          cls_gt_mask)
        s = samples.rois.shape[1]
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi_feats.reshape(b * s, 7, 7, -1),
            method=FasterRCNNNet.roi_forward)
        cls_logits = cls_logits.astype(jnp.float32)
        reg_preds = reg_preds.astype(jnp.float32)

        # teacher background probability on the SAME RoIs (geometry shared)
        t_feats = self._teacher_feats(t_vars, unsup_weak['images'])
        t_cls, _ = self._teacher_roi(t_vars, t_feats, samples.rois)
        bg_prob = jax.nn.softmax(t_cls, axis=-1)[..., -1].reshape(-1)

        labels = samples.labels.reshape(-1)
        valid = samples.valid.reshape(-1)
        is_neg = (labels == self.num_classes) & valid
        w = jnp.where(is_neg, jax.lax.stop_gradient(bg_prob),
                      valid.astype(jnp.float32))
        ce = cross_entropy_int(cls_logits, labels)
        loss_cls = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        # RCNN reg only on low-uncertainty pseudo boxes
        reg_gt_mask = pseudo.mask & (rel_unc < cfg.reg_pseudo_thr)
        samples_r = jax.vmap(
            lambda k, pbx, pm, gb, gl, gm: rcnn_sample_single(
                k, pbx, pm, gb, gl, gm, self.num_classes,
                self.rcnn_coder, self.rcnn_train_cfg)
        )(jax.random.split(jax.random.fold_in(rng, 3), b), prop_boxes,
          prop_mask, pseudo.bboxes, pseudo.labels, reg_gt_mask)
        roi_feats_r = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples_r.rois)
        cls_r, reg_r = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi_feats_r.reshape(b * s, 7, 7, -1),
            method=FasterRCNNNet.roi_forward)
        reg_losses, _ = rcnn_loss(cls_r.astype(jnp.float32),
                                  reg_r.astype(jnp.float32), samples_r,
                                  self.num_classes, self.rcnn_train_cfg)

        uw = cfg.unsup_weight
        losses.update({
            'unsup_loss_rpn_cls': uw * rpn_losses['loss_rpn_cls'],
            'unsup_loss_rpn_bbox': uw * rpn_losses['loss_rpn_bbox'],
            'unsup_loss_cls': uw * loss_cls,
            'unsup_loss_bbox': uw * reg_losses['loss_bbox'],
        })
        return losses


def res_scores_at(score, idx):
    return jax.vmap(lambda a, i: a[i])(score, idx)
