"""FreeAnchor detector assembly (RetinaNet + learning-to-match bags).

Mirrors /root/reference/configs/free_anchor/freeanchor_r50_fpn_1x_coco.py:
standard RetinaNet net (9 anchors/cell) with the FreeAnchor bag loss and
the (0.1, 0.1, 0.2, 0.2)-std delta coder; standard retina predict path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..heads.free_anchor_head import free_anchor_coder, free_anchor_loss
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.retina_head import retina_anchor_generator, retina_predict
from .retinanet import RetinaNetDetector


@dataclass
class FreeAnchorDetector(RetinaNetDetector):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def __post_init__(self):
        super().__post_init__()
        self.coder = free_anchor_coder()
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        cls_lvl, reg_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        return free_anchor_loss(
            jnp.asarray(ctx.anchors), cls_flat, reg_flat, batch['gt'],
            self.num_classes, self.coder,
            pre_anchor_topk=self.pre_anchor_topk, bbox_thr=self.bbox_thr,
            gamma=self.gamma, alpha=self.alpha)
