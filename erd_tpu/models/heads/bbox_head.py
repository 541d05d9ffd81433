"""R-CNN bbox head (Shared2FC) + RoI target building + losses + predict.

Behavioural mirror of /root/reference/mmdet/models/roi_heads/bbox_heads/
convfc_bbox_head.py (Shared2FCBBoxHead) with the faster-rcnn_r50_fpn config:
flatten 7x7x256 -> fc1024 -> fc1024 -> {softmax CE over C+1, class-specific
4C deltas with stds (0.1, 0.1, 0.2, 0.2), L1 loss}; RoI assignment
MaxIoU(0.5/0.5, no low-quality matches), RandomSampler(512, 0.25,
add_gt_as_proposals).
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ...losses import cross_entropy_int
from ...ops import nms_select, nms_select_cfg
from ...structures.boxes import scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ...task.samplers import ohem_sample, random_sample
from .gfl_head import GFLTestConfig


class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    fc_dim: int = 1024
    reg_class_agnostic: bool = False
    # custom cls channels (SeesawLoss.get_cls_channels -> C + 2: C class
    # logits + a 2-way fg/bg objectness split); 0 keeps the C+1 default
    cls_channels: int = 0
    # cls_predictor_cfg NormedLinear temperature (seesaw configs); 0 =
    # plain Dense
    normed_temp: float = 0.0
    # Shared4Conv1FCBBoxHead (configs/gn, gn+ws): 4 GN'd 3x3 convs then
    # ONE shared fc instead of two plain fcs
    num_shared_convs: int = 0
    conv_out: int = 256
    conv_norm: str = ''  # '' | 'gn'
    conv_ws: bool = False

    @nn.compact
    def __call__(self, roi_feats):
        """(R, 7, 7, C) -> (cls (R, C+1 or cls_channels), reg (R, 4C or 4))."""
        x = roi_feats
        for i in range(self.num_shared_convs):
            if self.conv_ws:
                from ..layers import WSConv
                x = WSConv(self.conv_out, kernel_size=3, use_bias=False,
                           name=f'shared_conv{i}')(x)
            else:
                x = nn.Conv(self.conv_out, (3, 3),
                            padding=[(1, 1)] * 2,
                            use_bias=self.conv_norm != 'gn',
                            name=f'shared_conv{i}')(x)
            if self.conv_norm == 'gn':
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f'shared_gn{i}')(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name='shared_fc0')(x))
        if self.num_shared_convs == 0:  # plain Shared2FC default
            x = nn.relu(nn.Dense(self.fc_dim, name='shared_fc1')(x))
        n_cls = self.cls_channels or self.num_classes + 1
        if self.normed_temp > 0:
            from ..layers import NormedLinear
            cls = NormedLinear(n_cls, temperature=self.normed_temp,
                               name='fc_cls')(x)
        else:
            cls = nn.Dense(n_cls,
                           kernel_init=nn.initializers.normal(0.01),
                           name='fc_cls')(x)
        nreg = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(nreg, kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls, reg


@dataclass(frozen=True)
class RCNNTrainConfig:
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    num_samples: int = 512
    pos_fraction: float = 0.25
    add_gt_as_proposals: bool = True
    cls_weight: float = 1.0
    bbox_weight: float = 1.0
    # 'random' (RandomSampler) or 'ohem' (OHEMSampler: candidates ranked
    # by their current cls loss from a no-grad mining forward — reference
    # task_modules/samplers/ohem_sampler.py hard_mining,
    # configs/faster_rcnn/faster-rcnn_r50_fpn_ohem_1x_coco.py)
    sampler: str = 'random'


@flax.struct.dataclass
class RoISamples:
    """Per-image fixed-size sampled RoIs and their targets."""
    rois: jnp.ndarray         # (S, 4)
    labels: jnp.ndarray       # (S,) int32, num_classes = background
    deltas: jnp.ndarray       # (S, 4) encoded targets (pos only meaningful)
    is_pos: jnp.ndarray       # (S,)
    valid: jnp.ndarray        # (S,)
    gt_idx: jnp.ndarray       # (S,) assigned gt index (pos only meaningful)


def rcnn_assign_single(proposals, prop_mask, gt_b, gt_l, gt_m, num_classes,
                       cfg: RCNNTrainConfig):
    """Assign one image's candidate set (gt-augmented proposals).

    Returns (candidates (P,4), cand_mask, assign result, pos_mask,
    neg_mask, cand_labels) where cand_labels carries the assigned class
    for positives and ``num_classes`` (background) otherwise — the target
    an OHEM mining forward scores candidates against."""
    if cfg.add_gt_as_proposals:
        proposals = jnp.concatenate([gt_b, proposals])
        prop_mask = jnp.concatenate([gt_m, prop_mask])
    res = max_iou_assign(proposals, gt_b, gt_l, gt_m,
                         pos_iou_thr=cfg.pos_iou_thr,
                         neg_iou_thr=cfg.neg_iou_thr,
                         min_pos_iou=cfg.min_pos_iou,
                         match_low_quality=False, valid_flags=prop_mask)
    pos_mask = res.pos_mask & prop_mask
    neg_mask = (~res.pos_mask) & (res.labels != -2) & prop_mask
    cand_labels = jnp.where(pos_mask, res.labels,
                            num_classes).astype(jnp.int32)
    return proposals, prop_mask, res, pos_mask, neg_mask, cand_labels


def rcnn_sample_single(rng, proposals, prop_mask, gt_b, gt_l, gt_m,
                       num_classes, coder: DeltaXYWHBBoxCoder,
                       cfg: RCNNTrainConfig, mining_losses=None):
    """Assign+sample one image's proposals (optionally + gt boxes).

    ``mining_losses`` (P,) switches RandomSampler semantics to
    OHEMSampler: candidates ranked by their current per-candidate loss
    (highest first) instead of random keys."""
    proposals, prop_mask, res, pos_mask, neg_mask, _ = rcnn_assign_single(
        proposals, prop_mask, gt_b, gt_l, gt_m, num_classes, cfg)
    if mining_losses is not None:
        sample = ohem_sample(mining_losses, pos_mask, neg_mask,
                             num=cfg.num_samples,
                             pos_fraction=cfg.pos_fraction)
    else:
        sample = random_sample(rng, pos_mask, neg_mask,
                               num=cfg.num_samples,
                               pos_fraction=cfg.pos_fraction)
    rois = proposals[sample.idx]
    labels = jnp.where(sample.is_pos & sample.valid,
                       res.labels[sample.idx], num_classes)
    deltas = coder.encode(rois, gt_b[res.gt_idx[sample.idx]])
    deltas = jnp.nan_to_num(deltas, nan=0.0, posinf=0.0, neginf=0.0)
    return RoISamples(rois=rois, labels=labels.astype(jnp.int32),
                      deltas=deltas, is_pos=sample.is_pos & sample.valid,
                      valid=sample.valid,
                      gt_idx=res.gt_idx[sample.idx])


def rcnn_loss(cls_logits, reg_preds, samples: RoISamples, num_classes,
              cfg: RCNNTrainConfig = RCNNTrainConfig()):
    """cls (B*S, C+1); reg (B*S, 4C); samples batched (B, S, ...)."""
    labels = samples.labels.reshape(-1)
    valid = samples.valid.reshape(-1)
    is_pos = samples.is_pos.reshape(-1)
    n_valid = jnp.maximum(valid.sum(), 1.0)

    ce = cross_entropy_int(cls_logits, labels)
    loss_cls = cfg.cls_weight * (ce * valid).sum() / n_valid

    # class-specific delta slice at the target label
    r = reg_preds.reshape(reg_preds.shape[0], -1, 4)
    safe = jnp.clip(labels, 0, r.shape[1] - 1)
    reg_at_label = jnp.take_along_axis(
        r, safe[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    l1 = jnp.abs(reg_at_label - samples.deltas.reshape(-1, 4)).sum(-1)
    # Reference normalization (mmdet bbox_head.py loss):
    # avg_factor = bbox_targets.size(0) == the TOTAL sampled RoI count, not
    # the positive count — keeps the cls/bbox balance the recipe was tuned on.
    loss_bbox = cfg.bbox_weight * (l1 * is_pos).sum() / n_valid

    acc = ((cls_logits.argmax(-1) == labels) & valid).sum() / n_valid
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox), acc


def seesaw_rcnn_loss(cls_logits, reg_preds, samples: RoISamples,
                     num_classes, cum_samples, p=0.8, q=2.0,
                     cfg: RCNNTrainConfig = RCNNTrainConfig()):
    """Seesaw cls loss for the bbox head (mmdet losses/seesaw_loss.py
    SeesawLoss.forward, configs/seesaw_loss/*): cls logits are C + 2 —
    C class scores trained with the seesaw CE over POSITIVE samples only,
    plus a 2-way fg(0)/bg(1) objectness softmax over all samples; both
    normalized by the valid RoI count like the plain CE path. The
    per-class cumulative sample counter (a torch buffer in the reference)
    is threaded functionally: returns ``new_cum_samples`` (C + 1,) for
    the caller to carry in the train state. Reg branch = rcnn_loss's.
    """
    from ...losses import seesaw_loss
    labels = samples.labels.reshape(-1)
    valid = samples.valid.reshape(-1)
    is_pos = samples.is_pos.reshape(-1)
    n_valid = jnp.maximum(valid.sum(), 1.0)

    # accumulate per-category counts (reference :246-249; padding rows
    # excluded — torch has no padding)
    counts = jax.nn.one_hot(labels, num_classes + 1,
                            dtype=jnp.float32) * valid[:, None]
    new_cum = cum_samples + counts.sum(0)

    cls_scores = cls_logits[:, :num_classes]
    obj_scores = cls_logits[:, num_classes:num_classes + 2]
    pos = (labels < num_classes) & valid
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    loss_classes = cfg.cls_weight * seesaw_loss(
        cls_scores, safe_labels, new_cum[:num_classes], weight=pos,
        p=p, q=q, reduction='sum') / n_valid
    obj_labels = (labels == num_classes).astype(jnp.int32)
    obj_ce = cross_entropy_int(obj_scores, obj_labels)
    loss_obj = cfg.cls_weight * (obj_ce * valid).sum() / n_valid

    r = reg_preds.reshape(reg_preds.shape[0], -1, 4)
    safe = jnp.clip(labels, 0, r.shape[1] - 1)
    reg_at_label = jnp.take_along_axis(
        r, safe[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    l1 = jnp.abs(reg_at_label - samples.deltas.reshape(-1, 4)).sum(-1)
    loss_bbox = cfg.bbox_weight * (l1 * is_pos).sum() / n_valid
    return dict(loss_cls_classes=loss_classes,
                loss_cls_objectness=loss_obj,
                loss_bbox=loss_bbox), new_cum


def seesaw_activation(cls_logits, num_classes):
    """SeesawLoss.get_activation: (N, C+2) logits -> (N, C+1) scores
    with class probs gated by the fg-objectness prob and bg appended."""
    score_classes = jax.nn.softmax(cls_logits[..., :num_classes], axis=-1)
    score_obj = jax.nn.softmax(cls_logits[..., num_classes:num_classes + 2],
                               axis=-1)
    return jnp.concatenate(
        [score_classes * score_obj[..., :1], score_obj[..., 1:]], axis=-1)


def rcnn_predict_single(cls_logits, reg_preds, rois, roi_mask, img_shape,
                        scale_factor, num_classes,
                        coder: DeltaXYWHBBoxCoder,
                        cfg: GFLTestConfig, rescale=True, seesaw=False):
    """Post-process one image's RoI head outputs into detections."""
    if seesaw:  # (R, C+2) logits -> objectness-gated class probs
        scores = seesaw_activation(cls_logits, num_classes)[:, :num_classes]
    else:
        scores = jax.nn.softmax(cls_logits, axis=-1)[:, :num_classes]
    r = reg_preds.reshape(reg_preds.shape[0], num_classes, 4)
    # decode every class column, then flatten (R*C) candidates
    boxes = coder.decode(rois[:, None, :], r, max_shape=img_shape)  # (R,C,4)
    flat_scores = scores.reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32),
                      rois.shape[0])
    valid = jnp.repeat(roi_mask, num_classes) & \
        (flat_scores > cfg.score_thr)
    k = min(cfg.pre_nms_total, flat_scores.shape[0])
    top, idx = jax.lax.top_k(jnp.where(valid, flat_scores, -jnp.inf), k)
    vmask = top > -jnp.inf
    if rescale:
        sel_boxes = scale_boxes(flat_boxes[idx], 1.0 / scale_factor)
    else:
        sel_boxes = flat_boxes[idx]
    return nms_select_cfg(sel_boxes, jnp.where(vmask, top, 0.0),
                          labels[idx], cfg, valid_mask=vmask)
