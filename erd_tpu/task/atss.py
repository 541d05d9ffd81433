"""ATSS assigner — static-shape, vmappable.

Re-derivation of /root/reference/mmdet/models/task_modules/assigners/atss_assigner.py:74-254
with every dynamic construct replaced by masking:

  * "inside" anchor filtering (anchor_head.py:610-621 + allowed_border=-1)
    becomes a validity mask: invalid anchors get INF center distance so they
    never enter the candidate pool, and the caller zeroes their loss weights
    (mirroring ``unmap`` with fill=background / weight=0).
  * per-level top-k candidate selection uses static k = min(topk, level size);
    levels with fewer *valid* anchors than k yield masked candidate slots,
    excluded from the mean/std statistics (matching the reference's smaller
    candidate sets).
  * padded (invalid) ground-truth columns never produce positives.

Candidate IoU statistics use the SAMPLE std (ddof=1), like torch ``.std()``.
"""
from __future__ import annotations

from typing import Sequence

import flax.struct
import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_center, bbox_overlaps

INF = 1e8


@flax.struct.dataclass
class AssignResult:
    """Dense assignment for one image over N anchors.

    pos_mask: (N,) bool — anchor is positive.
    gt_idx:   (N,) int32 — 0-based index of the assigned gt (where positive).
    max_overlaps: (N,) float — IoU with the assigned gt (-INF where negative).
    labels:   (N,) int32 — class of assigned gt, -1 where negative.
    """
    pos_mask: jnp.ndarray
    gt_idx: jnp.ndarray
    max_overlaps: jnp.ndarray
    labels: jnp.ndarray


def atss_assign(anchors, num_level_anchors: Sequence[int], gt_bboxes,
                gt_labels, gt_mask, valid_flags=None, topk=9,
                overlap_override=None):
    """Assign one image's anchors to padded ground truth.

    Args:
        anchors: (N, 4) all-level anchors (static).
        num_level_anchors: static per-level counts summing to N.
        gt_bboxes: (G, 4) padded gt boxes.
        gt_labels: (G,) int32.
        gt_mask: (G,) bool validity of the padding slots.
        valid_flags: optional (N,) bool anchor validity.
        topk: candidates per level per gt.
        overlap_override: optional (N, G) matrix replacing the anchor IoU
            (DDOD's dynamic-cost ATSS: cls_prob^(1-a) * pred_iou^a,
            reference atss_assigner.py:142-159); candidate selection still
            uses anchor-center distances.
    """
    n = anchors.shape[0]
    g = gt_bboxes.shape[0]
    assert sum(num_level_anchors) == n

    overlaps = bbox_overlaps(anchors, gt_bboxes) \
        if overlap_override is None else overlap_override  # (N, G)
    gt_centers = bbox_center(gt_bboxes)  # (G, 2)
    anchor_centers = bbox_center(anchors)  # (N, 2)
    distances = jnp.sqrt(
        jnp.sum((anchor_centers[:, None, :] - gt_centers[None, :, :])**2,
                axis=-1))  # (N, G)
    if valid_flags is not None:
        distances = jnp.where(valid_flags[:, None], distances, INF)

    # Per-level top-k closest candidates (static k per level).
    cand_idx_parts = []
    cand_valid_parts = []
    start = 0
    for n_lvl in num_level_anchors:
        k = min(topk, n_lvl)
        d_lvl = distances[start:start + n_lvl]  # (n_lvl, G)
        # top-k smallest distance per gt: top_k over -distance, axis=anchor.
        neg_d, idx = jax.lax.top_k(-d_lvl.T, k)  # (G, k)
        cand_idx_parts.append(idx.T + start)  # (k, G)
        cand_valid_parts.append((-neg_d.T) < INF)  # slot backed by a valid anchor
        start += n_lvl
    cand_idx = jnp.concatenate(cand_idx_parts, axis=0)  # (K, G)
    cand_valid = jnp.concatenate(cand_valid_parts, axis=0)  # (K, G)

    gt_cols = jnp.arange(g)
    cand_overlaps = overlaps[cand_idx, gt_cols[None, :]]  # (K, G)

    # Per-gt masked mean + SAMPLE std threshold.
    cv = cand_valid.astype(overlaps.dtype)
    cnt = jnp.maximum(cv.sum(axis=0), 1.0)
    mean = (cand_overlaps * cv).sum(axis=0) / cnt
    var = (jnp.square(cand_overlaps - mean[None, :]) * cv).sum(axis=0) / \
        jnp.maximum(cnt - 1.0, 1.0)
    thr = mean + jnp.sqrt(jnp.maximum(var, 0.0))  # (G,)

    is_pos = (cand_overlaps >= thr[None, :]) & cand_valid

    # Candidate center strictly inside its gt (min side-distance > 0.01).
    cand_cx = anchor_centers[cand_idx, 0]  # (K, G)
    cand_cy = anchor_centers[cand_idx, 1]
    l_ = cand_cx - gt_bboxes[None, :, 0]
    t_ = cand_cy - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - cand_cx
    b_ = gt_bboxes[None, :, 3] - cand_cy
    in_gt = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01
    is_pos = is_pos & in_gt & gt_mask[None, :]

    # Scatter candidate positivity into the dense (N, G) mask.
    pos_dense = jnp.zeros((n, g), bool)
    pos_dense = pos_dense.at[cand_idx, gt_cols[None, :]].max(is_pos)

    # Resolve multi-assignment by max IoU.
    overlaps_sel = jnp.where(pos_dense, overlaps, -INF)
    max_overlaps = overlaps_sel.max(axis=1)
    gt_idx = overlaps_sel.argmax(axis=1).astype(jnp.int32)
    pos_mask = max_overlaps > -INF

    labels = jnp.where(pos_mask, gt_labels[gt_idx], -1).astype(jnp.int32)
    return AssignResult(pos_mask=pos_mask, gt_idx=gt_idx,
                        max_overlaps=max_overlaps, labels=labels)


def atss_assign_batch(anchors, num_level_anchors, gt_bboxes, gt_labels,
                      gt_mask, valid_flags=None, topk=9):
    """vmap over the batch dim of (gt_bboxes, gt_labels, gt_mask[, valid_flags])."""
    fn = lambda gb, gl, gm, vf: atss_assign(  # noqa: E731
        anchors, num_level_anchors, gb, gl, gm, vf, topk=topk)
    if valid_flags is None:
        valid_flags = jnp.ones((gt_bboxes.shape[0], anchors.shape[0]), bool)
    return jax.vmap(fn)(gt_bboxes, gt_labels, gt_mask, valid_flags)
