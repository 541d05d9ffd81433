"""ERD incremental detector: fused teacher+student train step.

TPU-native re-design of GFLIncrementERD
(/root/reference/mmdet/models/detectors/gfl_increment_erd.py:20-221) and
GFLHeadIncrementERD (/root/reference/mmdet/models/dense_heads/
gfl_head_increment_erd.py:57-484):

  * the frozen teacher is the same pure ``GFLNet.apply`` with its own params
    pytree under ``stop_gradient`` — teacher and student run in ONE jitted,
    differentiated step (no module mutation, no ``torch.no_grad`` contexts);
  * ERS (Elastic Response Selection, detector :143-200): the per-image
    ``score > mean + 2*std`` boolean ``nonzero`` becomes a capped top-k with a
    validity mask (sample std over all anchors, like torch ``.std()``);
  * the distill-reg NMS dedupe (head :196-202, iou_thr=0.005) uses the
    fixed-shape batched-NMS keep mask;
  * the per-image distill losses (head :142-223) are vmapped and summed, then
    scaled by 1/num_devices — exactly the objective DDP gradient averaging
    induces on the reference's per-rank per-image loss sums.

Class-channel layout invariant (SURVEY.md section 2.1): teacher owns channels
[0, ori_num_classes); the new-task dataset's labels 0..K-1 supervise channels
[ori_num_classes, num_classes) via a slice of the student's cls map
(head :260-271).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (knowledge_distillation_kl_div_loss, l2_response_loss)
from ...ops import batched_nms_mask, integral, masked_mean_std, \
    topk_mask_select
from ...structures import distance2bbox
from ...structures.boxes import bbox_center
from ..heads.gfl_head import flatten_levels, gfl_loss, gfl_targets
from .single_stage import GFLDetector


@dataclass
class ERDConfig:
    ori_num_classes: int = 40
    dist_loss_weight: float = 1.0
    ld_weight: float = 0.25
    ld_T: float = 10.0
    distill_nms_iou: float = 0.005
    # NOTE: the cls-branch ERS selection has NO cap knob: the shipped
    # semantics is the dense exact mask (score > mu + 2*sigma over ALL
    # anchors, ers_cls_mask_dense) — a cap would change nothing on the loss
    # (the mask is applied densely) and a capped gather is slower on TPU.
    # reg-branch candidate cap. 0 (default) = auto-EXACT: one-sided
    # Chebyshev bounds P(X > mu+2*sigma) <= 1/5 for ANY sample, so
    # N//5 + 1 slots can never truncate the mu+2*sigma selection and the
    # capped top-k is semantically identical to the reference's uncapped
    # gather (gfl_increment_erd.py:155-163). A positive value pins the
    # static candidate count instead (round-3 behavior, cap=1000).
    ers_reg_cap: int = 0
    # Exact small-candidate NMS fast path: when the ACTUAL mu+2sigma
    # selection count (a data-dependent scalar, max over the batch) fits in
    # this many slots, the distill-NMS runs on the compacted top-K
    # candidate set instead of the full Chebyshev bound (N//5+1 = 4481 at
    # 800x1344, a 4481^2 suppress matrix per image). Both branches of the
    # ``lax.cond`` are semantically identical: topk_mask_select orders
    # candidates by criterion descending, so the selected entries always
    # occupy a prefix and truncating to K >= count drops only invalid
    # slots. Measured round 5: exact-auto 48.4 img/s vs capped-1000 53.4 —
    # this recovers the gap at exact semantics. 0 disables the fast path.
    ers_nms_fast_k: int = 1024
    num_devices: int = 1      # data-parallel width, for DDP-equivalent scaling


def ers_select(cls_scores, bbox_preds, cls_cap, reg_cap):
    """Elastic Response Selection for one image (static shapes).

    Args:
        cls_scores: (N, C) teacher cls logits (old classes only).
        bbox_preds: (N, 4*(reg_max+1)) teacher distribution logits.
    Returns (cls_idx, cls_mask, reg_idx, reg_mask).
    """
    conf = jax.nn.sigmoid(cls_scores)
    max_scores = conf.max(axis=-1)
    n = max_scores.shape[0]
    ones = jnp.ones((n,), bool)
    mean, std = masked_mean_std(max_scores, ones)
    cls_idx, cls_mask = topk_mask_select(max_scores, cls_cap, mean + 2 * std)

    max_bbox = bbox_preds.max(axis=-1)
    bmean, bstd = masked_mean_std(max_bbox, ones)
    reg_idx, reg_mask = topk_mask_select(max_bbox, reg_cap, bmean + 2 * bstd)
    return cls_idx, cls_mask, reg_idx, reg_mask


def ers_cls_mask_dense(cls_scores):
    """Dense ERS cls-branch mask: score > mean + 2*sample-std, no cap.

    (N, C) teacher logits -> (N,) bool. Exact sel_pos_single cls semantics
    (gfl_increment_erd.py:146-151) — the dense form needs no top-k cap AND
    keeps the distillation backward purely elementwise (a gathered form
    turns into a serial scatter loop on TPU; see docs/ROUND1.md perf notes).
    """
    max_scores = jax.nn.sigmoid(cls_scores).max(axis=-1)
    mean, std = masked_mean_std(max_scores,
                                jnp.ones(max_scores.shape, bool))
    return max_scores > mean + 2 * std


def erd_distill_losses(anchors, s_cls, s_reg, t_cls, t_reg, cfg: ERDConfig,
                       reg_max=16):
    """ERD distillation terms for a batch, dense-masked (head :142-223).

    Args:
        anchors: (N, 4) anchor boxes of the bucket.
        s_cls: (B, N, num_classes) student cls logits (flattened levels).
        s_reg: (B, N, 4*(reg_max+1)) student distribution logits.
        t_cls: (B, N, ori_num_classes) teacher cls logits.
        t_reg: (B, N, 4*(reg_max+1)) teacher distribution logits.

    Returns (loss_dist_cls, loss_dist_bbox), each (B,) per-image sums — the
    caller applies dist_loss_weight and DDP-equivalent 1/num_devices scaling.

    All selections are stop-gradient masks over the full anchor axis, so the
    backward pass is elementwise; gathered formulations lower to serial
    scatter while-loops on TPU (~66 ms/step measured, docs/ROUND1.md).
    """
    ori_c = cfg.ori_num_classes
    centers = bbox_center(anchors)  # (N, 2) full-canvas frame

    # ERS cls branch: dense mask (exact, uncapped). Reg branch: capped top-k
    # because its NMS dedupe needs a bounded candidate set.
    cls_mask_dense = jax.vmap(ers_cls_mask_dense)(t_cls)  # (B, N)

    def _reg_select(r):
        crit = r.max(axis=-1)
        mean, std = masked_mean_std(crit, jnp.ones(crit.shape, bool))
        cap = cfg.ers_reg_cap if cfg.ers_reg_cap > 0 \
            else crit.shape[0] // 5 + 1  # Chebyshev-exact (see ERDConfig)
        return topk_mask_select(crit, cap, mean + 2 * std)

    reg_idx, reg_mask = jax.vmap(_reg_select)(t_reg)

    def _kept_dense_batch(ri, rm):
        """NMS-dedupe the ERS-reg candidates, scattered back densely."""
        def one(t_cls_i, t_reg_i, ri_i, rm_i):
            t_dist = integral(t_reg_i, reg_max)  # (N, 4)
            t_boxes = distance2bbox(centers, t_dist)
            t_conf = jax.nn.sigmoid(t_cls_i)
            conf = t_conf.max(axis=-1)
            ids = t_conf.argmax(axis=-1)
            keep = batched_nms_mask(t_boxes[ri_i], conf[ri_i], ids[ri_i],
                                    cfg.distill_nms_iou, valid_mask=rm_i)
            n = t_cls_i.shape[0]
            return jnp.zeros((n,), bool).at[ri_i].max(keep & rm_i)

        return jax.vmap(one)(t_cls, t_reg, ri, rm)

    # Exact count-then-compact fast path (see ERDConfig.ers_nms_fast_k):
    # topk_mask_select sorts by criterion descending, so selected
    # candidates are a PREFIX of reg_idx — when every image's selection
    # count fits in K slots, NMS over the first K candidates is
    # candidate-set-identical to NMS over the full Chebyshev bound. The
    # branch lives OUTSIDE the per-image vmap (a vmapped cond lowers to
    # select and would execute both sides).
    cap = reg_idx.shape[1]
    fast_k = min(cfg.ers_nms_fast_k, cap) if cfg.ers_nms_fast_k > 0 else 0
    if 0 < fast_k < cap:
        n_sel_max = reg_mask.sum(axis=-1).max()
        kept_dense_b = jax.lax.cond(
            n_sel_max <= fast_k,
            lambda: _kept_dense_batch(reg_idx[:, :fast_k],
                                      reg_mask[:, :fast_k]),
            lambda: _kept_dense_batch(reg_idx, reg_mask))
    else:
        kept_dense_b = _kept_dense_batch(reg_idx, reg_mask)

    def distill_single(s_cls_i, s_reg_i, t_cls_i, t_reg_i, cmask,
                       kept_dense):
        # cls distill: mean-L2 over the mu+2sigma-selected rows of the
        # old-class block (exact reference semantics, uncapped).
        l_cls = l2_response_loss(s_cls_i[:, :ori_c], t_cls_i,
                                 mask=cmask[:, None])

        # reg distill: KD-KL everywhere, weighted by the NMS-kept mask *
        # detached student old-class confidence (head :196-223).
        n = t_cls_i.shape[0]
        w = jax.nn.sigmoid(
            jax.lax.stop_gradient(s_cls_i[:, :ori_c])).max(axis=-1)
        w = jnp.where(kept_dense, w, 0.0)  # (N,)
        s_corners = s_reg_i.reshape(n * 4, reg_max + 1)
        t_corners = t_reg_i.reshape(n * 4, reg_max + 1)
        w4 = jnp.broadcast_to(w[:, None], (n, 4)).reshape(-1)
        l_reg = knowledge_distillation_kl_div_loss(
            s_corners, t_corners, weight=w4, T=cfg.ld_T, avg_factor=4.0)
        return l_cls, cfg.ld_weight * l_reg

    return jax.vmap(distill_single)(s_cls, s_reg, t_cls, t_reg,
                                    cls_mask_dense, kept_dense_b)


@dataclass
class ERDDetector(GFLDetector):
    """Student detector + frozen teacher co-execution."""
    erd: ERDConfig = field(default_factory=ERDConfig)

    def __post_init__(self):
        super().__post_init__()
        # Teacher shares the architecture but has ori_num_classes outputs.
        self.teacher = GFLDetector(
            num_classes=self.erd.ori_num_classes, depth=self.depth,
            reg_max=self.reg_max, compute_dtype=self.compute_dtype,
            dcn_stages=self.dcn_stages,
            preprocessor=self.preprocessor,
            anchor_generator=self.anchor_generator,
            train_cfg=self.train_cfg, test_cfg=self.test_cfg)
        self.loss_jit = jax.jit(self.loss)

    # -- stage bootstrap -------------------------------------------------
    def init_student_from_teacher(self, rng, teacher_variables,
                                  image_shape=(128, 128)):
        """Fresh student whose old-class channels equal the teacher."""
        from ..weight_import import widen_cls_head
        student = self.init(rng, image_shape=image_shape)
        return widen_cls_head(teacher_variables, student,
                              self.erd.ori_num_classes)

    # -- fused incremental loss -----------------------------------------
    def loss(self, variables, batch, teacher_variables=None):
        assert teacher_variables is not None, 'ERD loss needs the teacher'
        cfg = self.erd
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        ori_c = cfg.ori_num_classes
        new_c = self.num_classes - ori_c

        # Teacher forward, frozen (mode='tensor'; detector :205).
        t_vars = jax.lax.stop_gradient(teacher_variables)
        t_cls_lvl, t_reg_lvl = self.teacher.forward_raw(t_vars, images)
        t_cls = flatten_levels(t_cls_lvl).astype(jnp.float32)  # (B, N, ori_c)
        t_reg = flatten_levels(t_reg_lvl).astype(jnp.float32)  # (B, N, 68)
        t_cls = jax.lax.stop_gradient(t_cls)
        t_reg = jax.lax.stop_gradient(t_reg)

        # Student forward.
        s_cls_lvl, s_reg_lvl = self.forward_raw(variables, images)
        s_cls = flatten_levels(s_cls_lvl).astype(jnp.float32)  # (B, N, 80)
        s_reg = flatten_levels(s_reg_lvl).astype(jnp.float32)

        # ---- supervised new-class branch (head :225-322) ----
        targets = gfl_targets(ctx, batch['gt'], batch['meta'].img_shape,
                              new_c, topk=self.train_cfg.assigner_topk,
                              pad_divisor=self.train_cfg.pad_divisor)
        losses = gfl_loss(ctx, s_cls[..., ori_c:], s_reg, targets,
                          self.train_cfg, reg_max=self.reg_max)

        # ---- distillation (head :142-223), computed DENSELY ----
        l_cls_i, l_reg_i = erd_distill_losses(
            jnp.asarray(ctx.anchors), s_cls, s_reg, t_cls, t_reg, cfg,
            reg_max=self.reg_max)

        # DDP-equivalent scaling of the per-image loss sums (see module doc).
        scale = cfg.dist_loss_weight / cfg.num_devices
        losses['loss_dist_cls'] = scale * l_cls_i.sum()
        losses['loss_dist_bbox'] = scale * l_reg_i.sum()
        return losses
