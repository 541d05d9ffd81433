"""PanopticFPN: Mask R-CNN + semantic FPN head + heuristic fusion.

Behavioural mirror of /root/reference/mmdet/models/detectors/
panoptic_fpn.py + seg_heads/panoptic_fpn_head.py +
seg_heads/panoptic_fusion_heads/heuristic_fusion_head.py: the instance
branch IS Mask R-CNN; the semantic branch predicts stuff+1 logits at
stride 4 with CE loss (weight 0.5); at inference the fusion head lays
instance masks in score order (an instance is dropped when more than half
of its mask is already covered, heuristic_fusion_head.py:35-78), then
fills remaining pixels with stuff classes from the semantic argmax if the
stuff region is larger than ``stuff_area_limit`` (=4096).

Fusion runs host-side in numpy on the device outputs (pasted masks +
semantic logits) — it is pure bookkeeping, not compute.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..heads.panoptic_fpn_head import PanopticFPNHead, semantic_loss
from ..layers import cast_compute_params
from .mask_rcnn import MaskRCNNDetector, MaskRCNNNet

INSTANCE_OFFSET = 1000  # panoptic id = label + INSTANCE_OFFSET * inst_id


class PanopticFPNNet(MaskRCNNNet):
    num_stuff_classes: int = 53

    def setup(self):
        super().setup()
        self.semantic_head = PanopticFPNHead(
            num_stuff_classes=self.num_stuff_classes)

    def semantic_forward(self, feats):
        return self.semantic_head(feats[:4])

    def __call__(self, images):
        out = super().__call__(images)
        feats = self.extract_feat(images)
        sem = self.semantic_head(feats[:4])
        return out + (sem,)


@dataclass
class PanopticFPNDetector(MaskRCNNDetector):
    num_stuff_classes: int = 53
    semantic_loss_weight: float = 0.5
    stuff_area_limit: int = 4096
    fusion_mask_thr: float = 0.5
    fusion_overlap_thr: float = 0.5

    def __post_init__(self):
        super().__post_init__()
        self.net = PanopticFPNNet(num_classes=self.num_classes,
                                  depth=self.depth,
                                  num_stuff_classes=self.num_stuff_classes,
                                  compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def loss(self, variables, batch):
        losses = super().loss(variables, batch)
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), method='extract_feat')
        sem_logits = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), feats,
            method='semantic_forward')
        sem_target = batch.get('sem_seg')
        assert sem_target is not None, \
            'PanopticFPN training needs batch["sem_seg"] (B, H, W) labels'
        losses['loss_semantic'] = semantic_loss(
            sem_logits, sem_target, self.num_stuff_classes,
            loss_weight=self.semantic_loss_weight)
        return losses

    def predict(self, variables, batch, rescale=True):
        det, masks = super().predict(variables, batch, rescale=rescale)
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), method='extract_feat')
        sem_logits = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), feats,
            method='semantic_forward')
        return det, masks, sem_logits


def heuristic_fuse(det_boxes, det_labels, det_scores, det_valid,
                   pasted_masks, sem_logits_up, num_things_classes,
                   num_stuff_classes, score_thr=0.5, mask_thr=0.5,
                   overlap_thr=0.5, stuff_area_limit=4096):
    """Numpy panoptic fusion for ONE image.

    Args:
        det_*: (D,) / (D, 4) final detections (already score-sorted by NMS).
        pasted_masks: (D, H, W) float mask probs pasted to image frame.
        sem_logits_up: (H, W, S+1) semantic logits upsampled to image size.
    Returns (H, W) int32 panoptic map: thing pixels get
    label + INSTANCE_OFFSET * (1 + instance rank); stuff pixels get their
    class id (things classes occupy [0, num_things)); unassigned pixels
    get num_things + num_stuff (void).
    """
    h, w = pasted_masks.shape[-2:]
    pan = np.full((h, w), -1, np.int64)
    inst_id = 0
    order = np.argsort(-det_scores)
    for i in order:
        if not det_valid[i] or det_scores[i] < score_thr:
            continue
        m = pasted_masks[i] >= mask_thr
        area = m.sum()
        if area == 0:
            continue
        free = m & (pan == -1)
        if free.sum() / area < (1.0 - overlap_thr):
            continue
        inst_id += 1
        pan[free] = int(det_labels[i]) + INSTANCE_OFFSET * inst_id
    sem = sem_logits_up.argmax(-1)
    for s in range(num_stuff_classes):
        region = (sem == s) & (pan == -1)
        if region.sum() >= stuff_area_limit:
            pan[region] = num_things_classes + s
    pan[pan == -1] = num_things_classes + num_stuff_classes  # void
    return pan.astype(np.int64)
