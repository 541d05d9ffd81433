"""LAD: Label Assignment Distillation on the PAA detector.

Behavioural mirror of /root/reference/mmdet/models/detectors/lad.py +
dense_heads/lad_head.py + configs/lad/*: a frozen teacher PAA model runs
the probabilistic anchor assignment (GMM over candidate losses) with ITS
OWN predictions (`get_label_assignment`, lad_head.py), and the student is
trained with the teacher's positive/negative split and assigned gts —
the losses themselves (QFL-style focal + GIoU + BCE IoU branch) are the
standard PAA losses computed on the student's outputs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..heads.paa_head import paa_assign, paa_loss_with_assignment
from .paa import PAADetector


@dataclass
class LADDetector(PAADetector):

    def __post_init__(self):
        super().__post_init__()
        # the teacher is architecturally identical (PAA R50/R101)
        self.teacher = PAADetector(num_classes=self.num_classes,
                                   depth=self.depth,
                                   compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)

    def loss(self, variables, batch, teacher_variables=None):
        assert teacher_variables is not None, 'LAD loss needs the teacher'
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        t_vars = jax.lax.stop_gradient(teacher_variables)
        t_cls_lvl, t_reg_lvl, _ = self.teacher.forward_raw(t_vars, images)
        cls_lvl, reg_lvl, iou_lvl = self.forward_raw(variables, images)
        b = images.shape[0]

        def flat(levels, last):
            return jnp.concatenate(
                [m.reshape(b, -1, last) if last > 1 else m.reshape(b, -1)
                 for m in levels], axis=1).astype(jnp.float32)

        t_cls = flat(t_cls_lvl, self.num_classes)
        t_reg = flat(t_reg_lvl, 4)
        cls_flat = flat(cls_lvl, self.num_classes)
        reg_flat = flat(reg_lvl, 4)
        iou_flat = flat(iou_lvl, 1)
        anchors = jnp.asarray(ctx.anchors)

        def assign_single(tc, tr, gt_b, gt_l, gt_m):
            decoded = self.coder.decode(anchors, tr)
            return paa_assign(ctx, tc, decoded, gt_b, gt_l, gt_m,
                              self.num_classes, topk=self.topk)

        gt = batch['gt']
        pos, gt_idx = jax.vmap(assign_single)(
            t_cls, t_reg, gt.bboxes, gt.labels, gt.mask)
        return paa_loss_with_assignment(
            ctx, cls_flat, reg_flat, iou_flat, gt, pos, gt_idx,
            self.coder, self.num_classes)
