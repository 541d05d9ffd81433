"""PISA-SSD: Prime Sample Attention on the SSD300 loss.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/pisa_ssd_head.py:55-182 +
losses/pisa_loss.py + configs/pisa/ssd300_pisa_coco.py: the SSD target
pipeline (MaxIoU 0.5/0.5/min 0, softmax CE with 3:1 hard-negative mining,
SmoothL1 beta=1), with (i) ISR-P (k=2, bias=0) reweighting the positive
classification weights by per-class decoded-IoU rank and (ii) CARL
(k=1, bias=0.2) scaling each positive's regression loss by its softmax
confidence at the gt label. Dense masked forms from losses/extra.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...losses import (carl_loss, cross_entropy_int, isr_p_weights,
                       smooth_l1_loss)
from ...structures.boxes import bbox_overlaps
from ..heads.ssd_head import ssd_targets
from .ssd import SSDDetector


@dataclass
class PISASSDDetector(SSDDetector):
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2

    def __post_init__(self):
        super().__post_init__()
        self.loss_jit = jax.jit(self.loss)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        c = self.num_classes
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, c + 1) for m in cls_lvl], axis=1)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        targets = ssd_targets(ctx, batch['gt'], c, self.coder)
        n = cls_flat.shape[1]
        pos = targets.pos_mask
        labels = jnp.where(pos, targets.labels, c)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        # ISR-P on the positives' CE weights (softmax CE protocol)
        anchors = jnp.asarray(ctx.anchors)[None]
        decoded = self.coder.decode(anchors, reg_flat)
        decoded_t = self.coder.decode(anchors, targets.deltas)
        iou = jax.lax.stop_gradient(
            bbox_overlaps(decoded.reshape(-1, 4),
                          decoded_t.reshape(-1, 4), is_aligned=True))
        probs = jax.lax.stop_gradient(
            jax.nn.softmax(cls_flat.reshape(-1, c + 1), axis=-1))
        flat_labels = labels.reshape(-1)
        p_at_label = jnp.take_along_axis(
            probs, jnp.clip(flat_labels, 0, c)[:, None], axis=1)[:, 0]
        isr_w = isr_p_weights(p_at_label, iou, pos.reshape(-1),
                              flat_labels, c, k=self.isr_k,
                              bias=self.isr_bias).reshape(b, n)

        ce = cross_entropy_int(cls_flat.reshape(-1, c + 1),
                               flat_labels).reshape(b, n)
        neg_ce = jnp.where(pos | ~targets.valid, -jnp.inf, ce)

        def mine(neg_row, n_pos_i):
            order = jnp.argsort(-neg_row)
            ranks = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n))
            keep = ranks < (3 * n_pos_i)
            return keep & (neg_row > -jnp.inf)

        neg_keep = jax.vmap(mine)(neg_ce, pos.sum(axis=1))
        loss_cls = (ce * (pos * isr_w + neg_keep)).sum() / num_pos

        sl1 = smooth_l1_loss(reg_flat, targets.deltas, reduction='none',
                             beta=1.0).sum(-1)
        loss_bbox = (sl1 * pos).sum() / num_pos
        loss_carl = carl_loss(p_at_label, sl1.reshape(-1),
                              pos.reshape(-1), k=self.carl_k,
                              bias=self.carl_bias, avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_carl=loss_carl)
