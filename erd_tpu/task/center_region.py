"""Center-region assignment (FSAF), dense/static-shape.

Behavioural mirror of
/root/reference/mmdet/models/task_modules/assigners/center_region_assigner.py:
- every gt has a *core* (pos_scale-shrunk) and *shadow* (neg_scale-shrunk)
  region; a prior is a core candidate for gt j when its center lies inside
  the full gt box AND IoF(prior, core_j) > min_pos_iof;
- core candidates are assigned to the smallest-area gt among their matches;
- shadow pairs (IoF(prior, shadow_j) > min_pos_iof but not a core pair of j)
  get the (prior, label_j) classification weight zeroed; a prior that is
  positive for label c and simultaneously shadowed for the same c is demoted
  to negative (reference ``foreground_dominate=False`` branch, :268-277).

Everything is computed as dense (P, G) masks under vmap; no nonzero/sort.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ..structures.boxes import bbox_area, bbox_overlaps

INF = 1e8


@flax.struct.dataclass
class CenterRegionResult:
    gt_idx: jnp.ndarray     # (P,) index into padded gt axis (garbage if neg)
    pos_mask: jnp.ndarray   # (P,) bool
    labels: jnp.ndarray     # (P,) assigned gt label (garbage if neg)
    shadow: jnp.ndarray     # (P, G) bool shadow pairs


def scale_region(bboxes, scale):
    """Shrink/expand boxes around their center (reference :14-38)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    hw = (bboxes[..., 2] - bboxes[..., 0]) * 0.5 * scale
    hh = (bboxes[..., 3] - bboxes[..., 1]) * 0.5 * scale
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def center_region_assign(priors, gt_bboxes, gt_labels, gt_mask,
                         pos_scale=0.2, neg_scale=0.2, min_pos_iof=0.01):
    """priors (P, 4); gt_* padded to (G,) / (G, 4) with validity gt_mask."""
    centers = jnp.stack([(priors[:, 0] + priors[:, 2]) * 0.5,
                         (priors[:, 1] + priors[:, 3]) * 0.5], axis=-1)
    core = scale_region(gt_bboxes, pos_scale)
    shadow_r = scale_region(gt_bboxes, neg_scale)

    in_gt = ((centers[:, None, 0] >= gt_bboxes[None, :, 0]) &
             (centers[:, None, 0] <= gt_bboxes[None, :, 2]) &
             (centers[:, None, 1] >= gt_bboxes[None, :, 1]) &
             (centers[:, None, 1] <= gt_bboxes[None, :, 3]))
    iof_core = bbox_overlaps(priors, core, mode='iof')
    core_pair = in_gt & (iof_core > min_pos_iof) & gt_mask[None, :]
    iof_shadow = bbox_overlaps(priors, shadow_r, mode='iof')
    shadow_pair = (iof_shadow > min_pos_iof) & ~core_pair & gt_mask[None, :]

    areas = jnp.where(gt_mask, bbox_area(gt_bboxes), INF)
    cand_areas = jnp.where(core_pair, areas[None, :], INF)
    gt_idx = cand_areas.argmin(axis=1)
    pos = core_pair.any(axis=1)
    labels = gt_labels[gt_idx]

    # demote priors that are positive for a class c but shadowed by another
    # gt of the same class (reference :268-277, foreground_dominate=False)
    shadow_same_cls = (shadow_pair &
                       (gt_labels[None, :] == labels[:, None])).any(axis=1)
    pos = pos & ~shadow_same_cls
    return CenterRegionResult(gt_idx=gt_idx, pos_mask=pos, labels=labels,
                              shadow=shadow_pair)
