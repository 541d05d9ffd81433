"""Fixed-shape greedy NMS for TPU.

The reference relies on mmcv's CUDA NMS kernel through ``batched_nms``
(/root/reference/mmdet/models/dense_heads/base_dense_head.py:479 and
gfl_head_increment_erd.py:202). Here NMS is expressed as a static-shape
XLA program: sort by score, precompute the pairwise IoU matrix once, then a
sequential suppression scan. Exactly reproduces greedy NMS semantics
(including the class-offset trick of ``batched_nms``) with no dynamic shapes,
so it lives happily inside jit/vmap/pjit.

For N = nms_pre = 1000 the IoU matrix is 1e6 floats (4 MB) — well within
VMEM/HBM budgets; the scan is N vector steps. A Pallas kernel can replace the
scan if profiling shows it dominating (tracked for a later perf pass).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp



def nms_mask(boxes, scores, iou_threshold, valid_mask=None):
    """Greedy NMS returning a keep-mask over the input order.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,) — invalid entries should carry -inf or use valid_mask.
        iou_threshold: float.
        valid_mask: optional (N,) bool; invalid entries never kept and never
            suppress others.

    Returns:
        keep: (N,) bool mask in the ORIGINAL order.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-scores)  # descending, stable
    sboxes = boxes[order]
    svalid = scores[order] > neg_inf

    suppress = _suppress_matrix(sboxes, svalid, iou_threshold)
    alive = _greedy_fixpoint(suppress, svalid, n)
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(alive)
    return keep


def _suppress_matrix(sboxes, svalid, iou_threshold, extra_mask=None):
    """suppress[i, j] = keeping sorted-box i would remove sorted-box j.

    Built directly from the 4 coordinate VECTORS so XLA emits one fusion
    writing the (N, N) bf16 output — the generic ``bbox_overlaps`` route
    stacks an (N, N, 2) lt/rb intermediate that materialized gigabytes at
    the ERD distill-NMS size (trace, round 4: f32[16,4481,4481,2]).
    Arithmetic is op-for-op identical to ``bbox_overlaps(mode='iou')`` +
    threshold, so keep masks are bit-identical. bf16 storage of the 0/1
    matrix halves sweep bandwidth and is exact.
    """
    x1, y1, x2, y2 = sboxes[:, 0], sboxes[:, 1], sboxes[:, 2], sboxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    iw = jnp.maximum(jnp.minimum(x2[:, None], x2[None, :]) -
                     jnp.maximum(x1[:, None], x1[None, :]), 0)
    ih = jnp.maximum(jnp.minimum(y2[:, None], y2[None, :]) -
                     jnp.maximum(y1[:, None], y1[None, :]), 0)
    overlap = iw * ih
    union = jnp.maximum(area[:, None] + area[None, :] - overlap, 1e-6)
    iou = overlap / union
    n = sboxes.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]  # j strictly after i in sorted order
    sup = (iou > iou_threshold) & later & svalid[:, None]
    if extra_mask is not None:
        sup = sup & extra_mask
    return sup.astype(jnp.bfloat16)


def _greedy_fixpoint(suppress, svalid, n):
    """Solve the greedy-NMS triangular recursion
        alive[j] = valid[j] and not any(suppress[i, j] and alive[i], i<j)
    as a Jacobi fixpoint: each sweep is one (N,)x(N,N) product on the MXU
    (bf16 0/1 entries, f32 accumulation — the >0 test is exact), and after
    k sweeps every box whose suppression-chain depth is < k is final; real
    workloads converge in a handful of sweeps. Exactness: the loop runs
    until nothing changes (bounded by N).
    """
    def cond(state):
        alive, prev, it = state
        return jnp.logical_and(jnp.any(alive != prev), it < n)

    def body(state):
        alive, _, it = state
        # preferred_element_type makes the documented f32 accumulation
        # explicit (bf16@bf16 would otherwise return bf16 with
        # backend-chosen accumulation; the >0 test is exact either way
        # since all terms are non-negative 0/1, but say what we mean).
        hit = jax.lax.dot(alive.astype(jnp.bfloat16)[None, :], suppress,
                          preferred_element_type=jnp.float32)[0] > 0
        return (svalid & ~hit, alive, it + 1)

    alive, _, _ = jax.lax.while_loop(
        cond, body, (svalid, jnp.zeros_like(svalid), 0))
    return alive


def set_nms_mask(boxes, scores, group_ids, iou_threshold,
                 valid_mask=None):
    """Set-NMS (CrowdDet, crowddet.py): identical to greedy NMS except
    boxes sharing a ``group_id`` (predictions from the SAME proposal)
    never suppress each other — the multi-instance pairs survive crowd
    overlap. Same Jacobi-fixpoint evaluation as nms_mask.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    svalid = scores[order] > neg_inf
    sgroup = group_ids[order]

    same_group = sgroup[:, None] == sgroup[None, :]
    suppress = _suppress_matrix(sboxes, svalid, iou_threshold,
                                extra_mask=~same_group)
    alive = _greedy_fixpoint(suppress, svalid, n)
    return jnp.zeros((n,), bool).at[order].set(alive)


def batched_nms_mask(boxes, scores, idxs, iou_threshold, valid_mask=None):
    """Class-aware NMS via the coordinate-offset trick (mmcv batched_nms)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid_mask)


def nms_select(boxes, scores, labels, iou_threshold, max_out,
               valid_mask=None, class_agnostic=False):
    """Batched-NMS then take the top ``max_out`` kept detections.

    Returns (boxes (max_out,4), scores (max_out,), labels (max_out,),
    mask (max_out,)) ordered by descending score; empty slots zeroed.
    """
    if class_agnostic:
        keep = nms_mask(boxes, scores, iou_threshold, valid_mask)
    else:
        keep = batched_nms_mask(boxes, scores, labels, iou_threshold,
                                valid_mask)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    kept_scores = jnp.where(keep, scores, neg_inf)
    k = min(max_out, kept_scores.shape[-1])
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    out_mask = top_scores > neg_inf
    out_boxes = jnp.where(out_mask[:, None], boxes[top_idx], 0.0)
    out_labels = jnp.where(out_mask, labels[top_idx], 0)
    out_scores = jnp.where(out_mask, top_scores, 0.0)
    if k < max_out:  # fewer candidates than capacity: pad to max_out
        pad = max_out - k
        out_boxes = jnp.concatenate(
            [out_boxes, jnp.zeros((pad, 4), out_boxes.dtype)])
        out_scores = jnp.concatenate(
            [out_scores, jnp.zeros((pad,), out_scores.dtype)])
        out_labels = jnp.concatenate(
            [out_labels, jnp.zeros((pad,), out_labels.dtype)])
        out_mask = jnp.concatenate([out_mask, jnp.zeros((pad,), bool)])
    return out_boxes, out_scores, out_labels, out_mask


def soft_nms_select(boxes, scores, labels, max_out, iou_threshold=0.3,
                    sigma=0.5, min_score=1e-3, method='linear',
                    valid_mask=None, class_agnostic=False):
    """Soft-NMS (Bodla et al. 2017) as a fixed-shape XLA scan.

    Mirrors mmcv's ``soft_nms`` as consumed through the reference's
    ``nms=dict(type='soft_nms', ...)`` test cfg
    (/root/reference/configs/faster_rcnn/faster-rcnn_r50_fpn_soft-nms_1x_
    coco.py: linear, /root/reference/configs/cornernet/...mstest_coco.py:44:
    gaussian) and batched over classes with the same coordinate-offset
    trick as ``batched_nms`` (cross-class IoU becomes 0 -> decay weight 1).

    Sequential semantics, expressed statically: ``max_out`` scan steps;
    step t picks the argmax of the current (decayed) scores, emits it with
    its decayed score, then multiplies every remaining candidate's score by
    the decay weight w(iou(sel, .)):
      linear:   w = 1 - iou        where iou > iou_threshold, else 1
      gaussian: w = exp(-iou^2 / sigma)
    Candidates whose decayed score falls below ``min_score`` are dropped
    (mmcv's in-loop discard). Selection-time scores are monotonically
    non-increasing (decay only lowers scores), so the output is
    score-sorted like ``nms_select``.

    Returns (boxes (max_out, 4), scores, labels, mask) — decayed scores,
    empty slots zeroed.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    cur = scores.astype(jnp.float32)
    if valid_mask is not None:
        cur = jnp.where(valid_mask, cur, neg_inf)
    if class_agnostic:
        shifted = boxes
    else:
        max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0))
        shifted = boxes + (labels.astype(boxes.dtype)
                           * (max_coord + 1))[:, None]
    x1, y1, x2, y2 = (shifted[:, 0], shifted[:, 1],
                      shifted[:, 2], shifted[:, 3])
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    def step(cur, _):
        i = jnp.argmax(cur)
        s_i = cur[i]
        iw = jnp.maximum(jnp.minimum(x2[i], x2) -
                         jnp.maximum(x1[i], x1), 0)
        ih = jnp.maximum(jnp.minimum(y2[i], y2) -
                         jnp.maximum(y1[i], y1), 0)
        overlap = iw * ih
        iou = overlap / jnp.maximum(area[i] + area - overlap, 1e-6)
        if method == 'gaussian':
            w = jnp.exp(-(iou * iou) / sigma)
        else:  # linear
            w = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        nxt = jnp.where(cur > neg_inf, cur * w, cur)
        # drop decayed-below-min candidates AND consume the selection
        nxt = jnp.where(nxt < min_score, neg_inf, nxt)
        nxt = nxt.at[i].set(neg_inf)
        return nxt, (i, s_i)

    k = min(max_out, n)
    _, (sel_idx, sel_scores) = jax.lax.scan(step, cur, None, length=k)
    out_mask = sel_scores >= min_score
    out_boxes = jnp.where(out_mask[:, None], boxes[sel_idx], 0.0)
    out_scores = jnp.where(out_mask, sel_scores, 0.0)
    out_labels = jnp.where(out_mask, labels[sel_idx], 0)
    if k < max_out:
        pad = max_out - k
        out_boxes = jnp.concatenate(
            [out_boxes, jnp.zeros((pad, 4), out_boxes.dtype)])
        out_scores = jnp.concatenate(
            [out_scores, jnp.zeros((pad,), out_scores.dtype)])
        out_labels = jnp.concatenate(
            [out_labels, jnp.zeros((pad,), out_labels.dtype)])
        out_mask = jnp.concatenate([out_mask, jnp.zeros((pad,), bool)])
    return out_boxes, out_scores, out_labels, out_mask


def nms_select_cfg(boxes, scores, labels, cfg, valid_mask=None,
                   class_agnostic=False):
    """Dispatch hard vs soft NMS from a test-config carrying
    ``nms_type``/``iou_threshold``/``soft_nms_*``/``max_per_img``
    (the typed mirror of the reference's ``test_cfg.nms`` dict)."""
    if getattr(cfg, 'nms_type', 'nms') == 'soft_nms':
        return soft_nms_select(
            boxes, scores, labels, cfg.max_per_img,
            iou_threshold=cfg.iou_threshold,
            sigma=cfg.soft_nms_sigma, min_score=cfg.soft_nms_min_score,
            method=cfg.soft_nms_method, valid_mask=valid_mask,
            class_agnostic=class_agnostic)
    return nms_select(boxes, scores, labels, cfg.iou_threshold,
                      cfg.max_per_img, valid_mask=valid_mask,
                      class_agnostic=class_agnostic)
