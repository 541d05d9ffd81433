"""LD: Localization Distillation single-stage KD detector.

Mirrors /root/reference/mmdet/models/detectors/kd_one_stage.py +
mmdet/models/dense_heads/ld_head.py — the distillation family whose
reg-branch KD the ERD head reuses: a same-class frozen teacher's box
DISTRIBUTIONS are distilled into the student at ATSS-assigned positives with
KD-KL (T=10) weighted like the DFL term (detached max-sigmoid cls score,
avg_factor=4), on top of the standard GFL losses.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ...losses import knowledge_distillation_kl_div_loss
from ..heads.gfl_head import flatten_levels, gfl_loss, gfl_targets
from .single_stage import GFLDetector


@dataclass
class LDDetector(GFLDetector):
    """GFL student distilling localization from a same-class GFL teacher."""
    ld_weight: float = 0.25
    ld_T: float = 10.0

    def __post_init__(self):
        super().__post_init__()
        self.teacher = GFLDetector(
            num_classes=self.num_classes, depth=self.depth,
            reg_max=self.reg_max, compute_dtype=self.compute_dtype,
            preprocessor=self.preprocessor,
            anchor_generator=self.anchor_generator,
            train_cfg=self.train_cfg, test_cfg=self.test_cfg)
        self.loss_jit = jax.jit(self.loss)

    def loss(self, variables, batch, teacher_variables=None):
        assert teacher_variables is not None, 'LD loss needs the teacher'
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])

        t_vars = jax.lax.stop_gradient(teacher_variables)
        _, t_reg_lvl = self.teacher.forward_raw(t_vars, images)
        t_reg = jax.lax.stop_gradient(
            flatten_levels(t_reg_lvl).astype(jnp.float32))

        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        s_cls = flatten_levels(cls_lvl).astype(jnp.float32)
        s_reg = flatten_levels(reg_lvl).astype(jnp.float32)

        targets = gfl_targets(ctx, batch['gt'], batch['meta'].img_shape,
                              self.num_classes,
                              topk=self.train_cfg.assigner_topk,
                              pad_divisor=self.train_cfg.pad_divisor)
        losses = gfl_loss(ctx, s_cls, s_reg, targets, self.train_cfg,
                          reg_max=self.reg_max)

        # LD term at assigned positives (ld_head.py loss_by_feat_single):
        # weight = detached max sigmoid cls at positives, per corner.
        b, n, _ = s_cls.shape
        wt = jax.nn.sigmoid(jax.lax.stop_gradient(s_cls)).max(axis=-1)
        wt = jnp.where(targets.pos_mask, wt, 0.0)
        k = self.reg_max + 1
        w4 = jnp.broadcast_to(wt[..., None], (b, n, 4)).reshape(-1)
        loss_ld = self.ld_weight * knowledge_distillation_kl_div_loss(
            s_reg.reshape(-1, k), t_reg.reshape(-1, k), weight=w4,
            T=self.ld_T, avg_factor=4.0)
        losses['loss_ld'] = loss_ld
        return losses
