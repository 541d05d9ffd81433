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


def _class_ap(db, ds, gb, iou_thr, drop_fp=False):
    """Greedy-matched all-point AP of one class pool (db sorted inside)."""
    if len(gb) == 0:
        return None
    order = np.argsort(-ds)
    db = db[order]
    matched = np.zeros(len(gb), bool)
    tp = np.zeros(len(db))
    for i in range(len(db)):
        if not len(gb):
            break
        iou = _iou_matrix(db[i:i + 1], gb)[0]
        iou[matched] = -1
        j = iou.argmax()
        if iou[j] >= iou_thr:
            matched[j] = True
            tp[i] = 1
    if drop_fp:
        keep = tp > 0
        tp = tp[keep]
    if len(tp) == 0:
        return 0.0
    ctp = np.cumsum(tp)
    prec = ctp / np.arange(1, len(tp) + 1)
    rec = ctp / len(gb)
    mrec = np.concatenate([[0], rec])
    mpre = np.concatenate([[0], prec])
    for k in range(len(mpre) - 2, -1, -1):
        mpre[k] = max(mpre[k], mpre[k + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())


def coco_error_analysis(results, dataset, num_classes):
    """Per-class error breakdown in the style of
    tools/analysis_tools/coco_error_analysis.py: C75 / C50 (strict APs),
    Loc (AP@0.1 — localization errors forgiven), Oth (AP@0.1 after
    removing detections hijacked by other-class gts — class confusion
    forgiven), BG (all remaining false positives removed), FN (=1.0; the
    rest of the gap is missed gts). Returns {class: {...}} + 'mean'.
    """
    by_id = {r['img_id']: r for r in results}
    out = {}
    for c in range(num_classes):
        db_all, ds_all, gb_all = [], [], []
        db_oth, ds_oth = [], []
        for rec in dataset:
            res = by_id.get(rec.img_id)
            gb = rec.bboxes[(rec.labels == c) & ~rec.ignore] \
                if len(rec.labels) else np.zeros((0, 4))
            gb_other = rec.bboxes[(rec.labels != c) & ~rec.ignore] \
                if len(rec.labels) else np.zeros((0, 4))
            gb_all.append(gb)
            if res is None:
                continue
            sel = res['labels'] == c
            db = res['bboxes'][sel]
            ds = res['scores'][sel]
            db_all.append(db)
            ds_all.append(ds)
            # Oth: drop detections overlapping other-class gts at >= 0.1
            if len(db) and len(gb_other):
                iof = _iou_matrix(db, gb_other)
                hij = iof.max(axis=1) >= 0.1
                # only drop if they do NOT match an own-class gt at 0.1
                own = (_iou_matrix(db, gb).max(axis=1) >= 0.1) \
                    if len(gb) else np.zeros(len(db), bool)
                keep = ~(hij & ~own)
            else:
                keep = np.ones(len(db), bool)
            db_oth.append(db[keep])
            ds_oth.append(ds[keep])
        gb = np.concatenate(gb_all) if gb_all else np.zeros((0, 4))
        db = np.concatenate(db_all) if db_all else np.zeros((0, 4))
        ds = np.concatenate(ds_all) if ds_all else np.zeros(0)
        dbo = np.concatenate(db_oth) if db_oth else np.zeros((0, 4))
        dso = np.concatenate(ds_oth) if ds_oth else np.zeros(0)
        # NOTE: pooling across images is the simplification (per-image
        # matching pooled by score is the exact protocol; for the error
        # DECOMPOSITION the pooled form preserves the ordering C75 <= C50
        # <= Loc <= Oth <= BG <= FN that the tool visualizes)
        c75 = _class_ap(db, ds, gb, 0.75)
        if c75 is None:
            continue
        out[c] = dict(
            C75=c75,
            C50=_class_ap(db, ds, gb, 0.5),
            Loc=_class_ap(db, ds, gb, 0.1),
            Oth=_class_ap(dbo, dso, gb, 0.1),
            BG=_class_ap(dbo, dso, gb, 0.1, drop_fp=True),
            FN=1.0)
    if out:
        mean = {k: float(np.mean([v[k] for v in out.values()]))
                for k in ('C75', 'C50', 'Loc', 'Oth', 'BG', 'FN')}
        out['mean'] = mean
    return out
