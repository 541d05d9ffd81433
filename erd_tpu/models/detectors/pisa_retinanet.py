"""PISA RetinaNet: Prime Sample Attention on the RetinaNet loss.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/pisa_retinanet_head.py +
losses/pisa_loss.py + configs/pisa/retinanet-r50_fpn_pisa_1x_coco.py:
standard RetinaNet targets, then (i) ISR-P (k=2, bias=0) reweights the
positive classification weights by the per-class decoded-IoU rank,
renormalized to preserve the positive mass, and (ii) CARL (k=1, bias=0.2)
scales each positive's regression loss by its classification confidence
at the gt label. Both use the dense masked forms in losses/extra.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...losses import (carl_loss, isr_p_weights, l1_loss,
                       sigmoid_focal_loss)
from ...structures.boxes import bbox_overlaps
from ..heads.retina_head import retina_targets
from .retinanet import RetinaNetDetector


@dataclass
class PISARetinaNetDetector(RetinaNetDetector):
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2

    def __post_init__(self):
        super().__post_init__()
        self.loss_jit = jax.jit(self.loss)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        c = self.num_classes
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, c) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = retina_targets(
            ctx, batch['gt'], batch['meta'].img_shape, c, self.coder,
            self.train_cfg,
            num_base_anchors=self.anchor_generator.num_base_anchors)

        anchors = jnp.asarray(ctx.anchors)[None]
        decoded = self.coder.decode(anchors, reg_flat)
        decoded_t = self.coder.decode(anchors, targets.bbox_targets)
        iou = jax.lax.stop_gradient(
            bbox_overlaps(decoded.reshape(-1, 4),
                          decoded_t.reshape(-1, 4), is_aligned=True))
        pos = targets.pos_mask.reshape(-1)
        labels = targets.labels.reshape(-1)
        probs = jax.lax.stop_gradient(jax.nn.sigmoid(
            cls_flat.reshape(-1, c)))
        p_at_label = jnp.take_along_axis(
            probs, jnp.clip(labels, 0, c - 1)[:, None], axis=1)[:, 0]

        isr_w = isr_p_weights(p_at_label, iou, pos, labels, c,
                              k=self.isr_k, bias=self.isr_bias)
        lw = targets.label_weights.reshape(-1) * \
            jnp.where(pos, isr_w, 1.0)
        avg = jnp.maximum(targets.num_pos, 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_flat.reshape(-1, c), labels, weight=lw,
            gamma=self.train_cfg.focal_gamma,
            alpha=self.train_cfg.focal_alpha, avg_factor=avg)

        l1 = jnp.abs(reg_flat - targets.bbox_targets).sum(-1).reshape(-1)
        loss_bbox = (l1 * pos *
                     targets.label_weights.reshape(-1)).sum() / avg
        loss_carl = carl_loss(p_at_label, l1, pos, k=self.carl_k,
                              bias=self.carl_bias, avg_factor=avg)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_carl=loss_carl)
