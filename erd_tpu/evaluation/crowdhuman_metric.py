"""CrowdHuman evaluation: AP + Caltech log-average Miss Rate (MR^-2).

Behavioural mirror of
/root/reference/mmdet/evaluation/metrics/crowdhuman_metric.py: detections
are matched per image greedily in descending score order (IoU >= 0.5 with
an unmatched gt -> TP; overlap >= 0.5 IoF with an *ignore* region ->
neither TP nor FP); AP follows the VOC continuous protocol over the pooled
detection list; MR is the Caltech log-average miss rate over the 9 FPPI
reference points 10^linspace(-2, 0, 9) (eval_mr).
"""
from __future__ import annotations

import numpy as np


def _iou_matrix(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return inter / np.clip(area_a[:, None] + area_b[None] - inter, 1e-9,
                           None)


def _iof_matrix(a, b):
    """Intersection over the area of a (det) — the ignore-region rule."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    return inter / np.clip(area_a[:, None], 1e-9, None)


def match_image(det_boxes, det_scores, gt_boxes, ignore_boxes,
                iou_thr=0.5):
    """Greedy per-image matching. Returns (scores, flags): flag 1 = TP,
    0 = FP; ignored detections are dropped."""
    order = np.argsort(-det_scores)
    matched = np.zeros(len(gt_boxes), bool)
    iou = _iou_matrix(det_boxes, gt_boxes)
    iof = _iof_matrix(det_boxes, ignore_boxes)
    scores, flags = [], []
    for i in order:
        row = iou[i].copy() if len(gt_boxes) else np.zeros(0)
        if len(row):
            row[matched] = -1
            j = row.argmax()
            if row[j] >= iou_thr:
                matched[j] = True
                scores.append(det_scores[i])
                flags.append(1)
                continue
        if len(ignore_boxes) and iof[i].max() >= iou_thr:
            continue  # inside an ignore region: not counted
        scores.append(det_scores[i])
        flags.append(0)
    return np.asarray(scores), np.asarray(flags, np.int32)


class CrowdHumanMetric:
    """Accumulate per-image matches; compute AP and MR^-2."""

    def __init__(self, iou_thr=0.5):
        self.iou_thr = iou_thr
        self._scores = []
        self._flags = []
        self.gt_num = 0
        self.img_num = 0

    def process(self, det_boxes, det_scores, gt_boxes, ignore_boxes=None):
        ignore_boxes = np.zeros((0, 4), np.float32) \
            if ignore_boxes is None else np.asarray(ignore_boxes)
        s, f = match_image(np.asarray(det_boxes), np.asarray(det_scores),
                           np.asarray(gt_boxes), ignore_boxes,
                           self.iou_thr)
        self._scores.append(s)
        self._flags.append(f)
        self.gt_num += len(gt_boxes)
        self.img_num += 1

    def compute(self):
        scores = np.concatenate(self._scores) if self._scores else \
            np.zeros(0)
        flags = np.concatenate(self._flags) if self._flags else \
            np.zeros(0, np.int32)
        order = np.argsort(-scores)
        flags = flags[order]
        tp = np.cumsum(flags)
        fp = np.cumsum(1 - flags)
        denom_gt = max(self.gt_num, 1)
        recall = tp / denom_gt
        precision = tp / np.clip(tp + fp, 1, None)

        # VOC continuous AP
        ap = 0.0
        if len(recall):
            mrec = np.concatenate([[0.0], recall, [recall[-1]]])
            mpre = np.concatenate([[0.0], precision, [0.0]])
            for k in range(len(mpre) - 2, -1, -1):
                mpre[k] = max(mpre[k], mpre[k + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            ap = float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())

        # Caltech MR^-2
        fppi = fp / max(self.img_num, 1)
        refs = np.power(10.0, np.linspace(-2, 0, 9))
        mrs = []
        for r in refs:
            valid = np.where(fppi <= r)[0]
            if len(valid):
                mrs.append(max(1.0 - recall[valid[-1]], 1e-10))
            else:
                mrs.append(1.0)
        mr = float(np.exp(np.mean(np.log(mrs))))
        return dict(AP=ap, MR=mr, recall=float(recall[-1]) if len(recall)
                    else 0.0)
