"""Result-analysis utilities backing tools/analysis_tools parity.

Behavioural mirrors of the reference's
tools/analysis_tools/confusion_matrix.py (per-class confusion from
IoU-matched detections, including the background row/column),
analyze_results.py (per-image mAP ranking to surface best/worst images)
and eval_metric.py (re-evaluate a dumped prediction pickle offline).
All operate on the DumpDetResults pickle rows
({'img_id', 'bboxes', 'scores', 'labels'}).
"""
from __future__ import annotations

import pickle
from typing import Dict, List

import numpy as np

from .crowdhuman_metric import _iou_matrix


def load_dump(path: str) -> List[dict]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def confusion_matrix(results: List[dict], dataset, num_classes,
                     score_thr=0.3, iou_thr=0.5, nms_iou_thr=None):
    """(C+1, C+1) confusion matrix; last index = background.

    Mirrors confusion_matrix.py calculate_confusion_matrix/analyze_per_img:
    detections above ``score_thr`` match gts at ``iou_thr``; each gt
    contributes one row entry (its best-matching det's class, else
    background column); unmatched detections land in the background row.
    """
    cm = np.zeros((num_classes + 1, num_classes + 1), np.float64)
    by_id = {r['img_id']: r for r in results}
    for rec in dataset:
        res = by_id.get(rec.img_id)
        if res is None:
            continue
        keep = res['scores'] >= score_thr
        db = res['bboxes'][keep]
        dl = res['labels'][keep]
        gb = rec.bboxes[~rec.ignore] if len(rec.bboxes) else rec.bboxes
        gl = rec.labels[~rec.ignore] if len(rec.labels) else rec.labels
        iou = _iou_matrix(db, gb)
        det_matched = np.zeros(len(db), bool)
        for j in range(len(gb)):
            if iou.shape[0] == 0:
                cm[gl[j], num_classes] += 1
                continue
            i = iou[:, j].argmax()
            if iou[i, j] >= iou_thr:
                cm[gl[j], dl[i]] += 1
                det_matched[i] = True
            else:
                cm[gl[j], num_classes] += 1
        for i in range(len(db)):
            if not det_matched[i]:
                cm[num_classes, dl[i]] += 1
    return cm


def per_image_scores(results: List[dict], dataset, iou_thr=0.5):
    """{img_id: simple per-image AP@iou} for best/worst ranking
    (analyze_results.py)."""
    by_id = {r['img_id']: r for r in results}
    out: Dict[int, float] = {}
    for rec in dataset:
        res = by_id.get(rec.img_id)
        gb = rec.bboxes[~rec.ignore] if len(rec.bboxes) else rec.bboxes
        if res is None or len(gb) == 0:
            continue
        order = np.argsort(-res['scores'])
        db = res['bboxes'][order]
        dl = res['labels'][order]
        gl = rec.labels[~rec.ignore]
        matched = np.zeros(len(gb), bool)
        tp = np.zeros(len(db))
        for i in range(len(db)):
            cand = np.flatnonzero((gl == dl[i]) & ~matched)
            if len(cand) == 0:
                continue
            iou = _iou_matrix(db[i:i + 1], gb[cand])[0]
            j = iou.argmax()
            if iou[j] >= iou_thr:
                matched[cand[j]] = True
                tp[i] = 1
        ctp = np.cumsum(tp)
        prec = ctp / np.arange(1, len(db) + 1)
        rec_ = ctp / len(gb)
        ap = 0.0
        if len(db):
            mrec = np.concatenate([[0], rec_])
            mpre = np.concatenate([[0], prec])
            for k in range(len(mpre) - 2, -1, -1):
                mpre[k] = max(mpre[k], mpre[k + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            ap = float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())
        out[rec.img_id] = ap
    return out


def eval_dumped(path: str, dataset, num_classes, classwise=False):
    """Re-run CocoMetric over a dumped pickle (eval_metric.py)."""
    from .coco_metric import CocoMetric
    metric = CocoMetric(dataset, classwise=classwise)
    for row in load_dump(path):
        metric.process_result(row['img_id'], row['bboxes'], row['scores'],
                              row['labels'])
    return metric.compute_metrics()
