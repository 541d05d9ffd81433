"""Panoptic Quality (PQ/SQ/RQ) evaluation.

Behavioural mirror of the panopticapi protocol used by the reference's
CocoPanopticMetric (/root/reference/mmdet/evaluation/metrics/
coco_panoptic_metric.py): segments match when IoU > 0.5 (computed over the
intersection of non-void pixels), PQ = sum IoU(TP) / (|TP| + |FP|/2 +
|FN|/2) per class, averaged over classes present in the ground truth;
SQ = mean matched IoU, RQ = TP / (TP + FP/2 + FN/2). Segments whose
intersection with gt void exceeds half their area do not count as FP
(the panopticapi void rule).

Panoptic map encoding matches detectors/panoptic_fpn.py: thing pixels =
label + 1000 * instance_id; stuff pixels = class id; void = num_classes.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

INSTANCE_OFFSET = 1000


def _segments(pan, void_id):
    segs = {}
    for sid in np.unique(pan):
        cat = int(sid % INSTANCE_OFFSET) if sid >= INSTANCE_OFFSET \
            else int(sid)
        if cat == void_id:
            continue
        segs[int(sid)] = (cat, pan == sid)
    return segs


def pq_single(pred_pan, gt_pan, void_id):
    """Per-image match stats: {cat: [iou_sum, tp, fp, fn]}."""
    stats = defaultdict(lambda: [0.0, 0, 0, 0])
    pred_segs = _segments(pred_pan, void_id)
    gt_segs = _segments(gt_pan, void_id)
    gt_void = gt_pan == void_id

    matched_pred = set()
    matched_gt = set()
    for gid, (gcat, gmask) in gt_segs.items():
        best_iou, best_pid = 0.0, None
        for pid, (pcat, pmask) in pred_segs.items():
            if pcat != gcat or pid in matched_pred:
                continue
            inter = np.logical_and(gmask, pmask).sum()
            if inter == 0:
                continue
            union = gmask.sum() + pmask.sum() - inter
            iou = inter / union
            if iou > best_iou:
                best_iou, best_pid = iou, pid
        if best_iou > 0.5:
            stats[gcat][0] += best_iou
            stats[gcat][1] += 1
            matched_pred.add(best_pid)
            matched_gt.add(gid)
    for gid, (gcat, _) in gt_segs.items():
        if gid not in matched_gt:
            stats[gcat][3] += 1
    for pid, (pcat, pmask) in pred_segs.items():
        if pid in matched_pred:
            continue
        # void rule: ignore predictions mostly covered by gt void
        if gt_void is not None and \
                np.logical_and(pmask, gt_void).sum() / pmask.sum() > 0.5:
            continue
        stats[pcat][2] += 1
    return stats


class PanopticMetric:
    """Accumulate per-image panoptic maps and compute PQ/SQ/RQ."""

    def __init__(self, num_things_classes=80, num_stuff_classes=53):
        self.void_id = num_things_classes + num_stuff_classes
        self.num_things = num_things_classes
        self._stats = defaultdict(lambda: [0.0, 0, 0, 0])

    def process(self, pred_pan, gt_pan):
        for cat, (iou, tp, fp, fn) in pq_single(
                np.asarray(pred_pan), np.asarray(gt_pan),
                self.void_id).items():
            s = self._stats[cat]
            s[0] += iou
            s[1] += tp
            s[2] += fp
            s[3] += fn

    def compute(self):
        per_class = {}
        pqs, sqs, rqs = [], [], []
        th_pq, st_pq = [], []
        for cat, (iou, tp, fp, fn) in sorted(self._stats.items()):
            if tp + fp + fn == 0:
                continue
            denom = tp + 0.5 * fp + 0.5 * fn
            pq = iou / denom if denom else 0.0
            sq = iou / tp if tp else 0.0
            rq = tp / denom if denom else 0.0
            per_class[cat] = dict(PQ=pq, SQ=sq, RQ=rq)
            pqs.append(pq)
            sqs.append(sq)
            rqs.append(rq)
            (th_pq if cat < self.num_things else st_pq).append(pq)
        n = max(len(pqs), 1)
        return dict(
            PQ=float(np.sum(pqs) / n), SQ=float(np.sum(sqs) / n),
            RQ=float(np.sum(rqs) / n),
            PQ_th=float(np.mean(th_pq)) if th_pq else 0.0,
            PQ_st=float(np.mean(st_pq)) if st_pq else 0.0,
            classwise=per_class)
