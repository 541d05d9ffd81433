"""Proposal recall (eval_recalls) and occluded/separated mask recall.

Behavioural mirrors of
/root/reference/mmdet/evaluation/functional/recall.py (eval_recalls:
greedy one-to-one gt<->proposal matching per image over the top-k
proposals, recall = fraction of gts whose matched IoU clears each
threshold) and metrics/coco_occluded_metric.py
(CocoOccludedSeparatedMetric.compute_recall: a gt mask counts as
recalled when some same-class detection with score > score_thr has mask
IoU >= iou_thr; the occluded/separated gt lists are supplied as local
files — the reference downloads them from a URL, gated here since the
environment has no egress).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .crowdhuman_metric import _iou_matrix


def _greedy_gt_ious(gt, props):
    """(G,) best IoU per gt under greedy one-to-one matching."""
    if len(gt) == 0:
        return np.zeros(0, np.float32)
    if len(props) == 0:
        return np.zeros(len(gt), np.float32)
    ious = _iou_matrix(gt, props)
    out = np.zeros(len(gt), np.float32)
    for _ in range(min(len(gt), len(props))):
        gt_best = ious.argmax(axis=1)
        best_per_gt = ious[np.arange(len(gt)), gt_best]
        g = best_per_gt.argmax()
        if best_per_gt[g] <= 0:
            break
        out[g] = best_per_gt[g]
        ious[g, :] = -1
        ious[:, gt_best[g]] = -1
    return out


def eval_recalls(gts: List[np.ndarray], proposals: List[np.ndarray],
                 proposal_nums: Sequence[int] = (100, 300, 1000),
                 iou_thrs: Sequence[float] = (0.5,)):
    """recalls[k, t] over top proposal_nums[k] at iou_thrs[t].

    proposals may be (N, 5) with a score column — sorted by it first.
    """
    proposal_nums = np.asarray(proposal_nums)
    iou_thrs = np.asarray(iou_thrs, np.float64)
    per_k = [[] for _ in proposal_nums]
    for gt, props in zip(gts, proposals):
        props = np.asarray(props, np.float32)
        if props.shape[-1] == 5:
            props = props[np.argsort(-props[:, 4])][:, :4]
        gt = np.asarray(gt, np.float32).reshape(-1, 4)
        for k, n in enumerate(proposal_nums):
            per_k[k].append(_greedy_gt_ious(gt, props[:n]))
    recalls = np.zeros((len(proposal_nums), len(iou_thrs)))
    for k in range(len(proposal_nums)):
        ious = np.concatenate(per_k[k]) if per_k[k] else np.zeros(0)
        total = max(len(ious), 1)
        for t, thr in enumerate(iou_thrs):
            recalls[k, t] = (ious >= thr).sum() / total
    return recalls


def mask_iou(m1, m2):
    inter = np.logical_and(m1, m2).sum()
    union = np.logical_or(m1, m2).sum()
    return inter / max(union, 1)


def occluded_separated_recall(detections, gt_ann, score_thr=0.3,
                              iou_thr=0.75):
    """coco_occluded_metric.py compute_recall. ``detections`` maps
    img_id -> list of (score, label_name, bitmap mask) sorted by
    descending score; ``gt_ann`` is the occluded/separated list of
    (img_id, label_name, bitmap mask) entries. Returns (recall%, hits).
    """
    hits = 0
    for img_id, cls_name, gt_mask in gt_ann:
        dets = detections.get(img_id, [])
        for score, label, mask in dets:
            if score < score_thr:
                break
            if label != cls_name:
                continue
            if mask_iou(mask, gt_mask) >= iou_thr:
                hits += 1
                break
    total = max(len(gt_ann), 1)
    return 100.0 * hits / total, hits


class CocoOccludedSeparatedMetric:
    """Metric-shaped wrapper over occluded_separated_recall
    (coco_occluded_metric.py CocoOccludedSeparatedMetric): accumulate
    per-image mask detections, then report occluded/separated recall
    alongside whatever a base CocoMetric computed. The gt lists are
    loaded from LOCAL pickle files of (img_id, class_name, bitmap)
    entries — the reference downloads them from a URL (no egress here).
    """

    def __init__(self, occluded_ann: str, separated_ann: str,
                 score_thr: float = 0.3, iou_thr: float = 0.75):
        import pickle
        with open(occluded_ann, 'rb') as f:
            self.occluded_ann = pickle.load(f)
        with open(separated_ann, 'rb') as f:
            self.separated_ann = pickle.load(f)
        self.score_thr = score_thr
        self.iou_thr = iou_thr
        self._dets: dict = {}

    def process_result(self, img_id, scores, label_names, bitmaps):
        rows = sorted(zip([float(s) for s in scores], label_names,
                          bitmaps), key=lambda r: -r[0])
        self._dets[img_id] = rows

    def compute_metrics(self):
        occ, occ_hits = occluded_separated_recall(
            self._dets, self.occluded_ann, self.score_thr, self.iou_thr)
        sep, sep_hits = occluded_separated_recall(
            self._dets, self.separated_ann, self.score_thr, self.iou_thr)
        return {'occluded_recall': occ, 'separated_recall': sep,
                'occluded_hits': occ_hits, 'separated_hits': sep_hits}
