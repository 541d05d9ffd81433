"""Point assignment (RepPoints init stage), dense/static-shape.

Behavioural mirror of
/root/reference/mmdet/models/task_modules/assigners/point_assigner.py:
each gt is routed to one pyramid level by its log2 size
(clamped to the available levels), then claims its single nearest point
(``pos_num=1``) at that level by gt-normalized center distance; conflicts
resolve to the closer gt (sequential scan in the reference == min-distance
resolution, since an overwrite happens exactly when the new distance is
strictly smaller).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

INF = 1e8


@flax.struct.dataclass
class PointAssignResult:
    gt_idx: jnp.ndarray    # (P,)
    pos_mask: jnp.ndarray  # (P,)
    labels: jnp.ndarray    # (P,)


def point_assign(points, point_strides, gt_bboxes, gt_labels, gt_mask,
                 scale=4, pos_num=1):
    """points (P, 2); point_strides (P,); gt padded (G, ...)."""
    points_lvl = jnp.floor(jnp.log2(point_strides)).astype(jnp.int32)
    lvl_min = points_lvl.min()
    lvl_max = points_lvl.max()

    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    gt_w = jnp.clip(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6, None)
    gt_h = jnp.clip(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6, None)
    # torch .int() truncates toward zero; sizes >= scale give positive logs,
    # and the clamp to [lvl_min, lvl_max] makes the <0 corner irrelevant
    gt_lvl = ((jnp.log2(gt_w / scale) + jnp.log2(gt_h / scale)) * 0.5)
    gt_lvl = jnp.clip(jnp.trunc(gt_lvl).astype(jnp.int32), lvl_min, lvl_max)

    dx = (points[:, None, 0] - gt_cx[None]) / gt_w[None]
    dy = (points[:, None, 1] - gt_cy[None]) / gt_h[None]
    dist = jnp.sqrt(dx * dx + dy * dy)                       # (P, G)
    same_lvl = points_lvl[:, None] == gt_lvl[None]
    dist_m = jnp.where(same_lvl & gt_mask[None], dist, INF)

    # per gt: its pos_num nearest points become candidates
    if pos_num == 1:
        best_p = dist_m.argmin(axis=0)                       # (G,)
        cand = jnp.zeros_like(dist_m, dtype=bool)
        cand = cand.at[best_p, jnp.arange(dist_m.shape[1])].set(True)
    else:
        import jax
        _, idx = jax.lax.top_k(-dist_m.T, pos_num)           # (G, pos_num)
        cand = jnp.zeros_like(dist_m, dtype=bool)
        cand = cand.at[idx.reshape(-1),
                       jnp.repeat(jnp.arange(dist_m.shape[1]),
                                  pos_num)].set(True)
    cand = cand & (dist_m < INF)
    # conflicting claims resolve to the closer gt
    cd = jnp.where(cand, dist_m, INF)
    gt_idx = cd.argmin(axis=1)
    pos = cd.min(axis=1) < INF
    labels = gt_labels[gt_idx]
    return PointAssignResult(gt_idx=gt_idx, pos_mask=pos, labels=labels)
