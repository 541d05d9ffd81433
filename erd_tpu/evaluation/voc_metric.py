"""VOC-style mAP (11-point or area AP at a single IoU).

Mirrors /root/reference/mmdet/evaluation/functional/mean_ap.py (eval_map)
semantics for the bbox case: per-class greedy matching at one IoU threshold,
difficult gts ignored, AP by 11-point interpolation ('11points', VOC2007) or
the every-point area method ('area').
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .coco_eval import DetectionResult, det_gt_iou


def average_precision(recalls, precisions, mode='area'):
    if mode == 'area':
        mrec = np.concatenate([[0.0], recalls, [1.0]])
        mpre = np.concatenate([[0.0], precisions, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())
    if mode == '11points':
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            prec = precisions[recalls >= t]
            ap += (prec.max() if prec.size else 0.0) / 11
        return float(ap)
    raise ValueError(mode)


class VOCMetric:
    """Accumulate DetectionResult objects; compute per-class AP + mAP."""

    def __init__(self, gt_records, num_classes, iou_thr=0.5,
                 mode='11points', class_names=None):
        self.gt = {r.img_id: r for r in gt_records}
        self.num_classes = num_classes
        self.iou_thr = iou_thr
        self.mode = mode
        self.class_names = class_names or [str(i)
                                           for i in range(num_classes)]
        self._results: Dict[int, DetectionResult] = {}

    def process(self, result: DetectionResult):
        self._results[result.img_id] = result

    def process_batch(self, det_results, metas):
        bboxes = np.asarray(det_results.bboxes)
        scores = np.asarray(det_results.scores)
        labels = np.asarray(det_results.labels)
        mask = np.asarray(det_results.mask)
        img_ids = np.asarray(metas.img_id)
        valid = np.asarray(metas.valid)
        for i in range(len(img_ids)):
            if not valid[i] or img_ids[i] < 0:
                continue
            m = mask[i]
            self.process(DetectionResult(
                img_id=int(img_ids[i]), bboxes=bboxes[i][m],
                scores=scores[i][m], labels=labels[i][m]))

    def compute_metrics(self) -> Dict[str, float]:
        aps = []
        out: Dict[str, float] = {}
        for k in range(self.num_classes):
            scores_all: List[float] = []
            tp_all: List[int] = []
            n_gt = 0
            for img_id, r in self.gt.items():
                g_sel = r.labels == k
                gts = r.bboxes[g_sel]
                gt_ig = r.ignore[g_sel]
                n_gt += int((~gt_ig).sum())
                det = self._results.get(img_id)
                if det is None:
                    continue
                d_sel = det.labels == k
                d_boxes = det.bboxes[d_sel]
                d_scores = det.scores[d_sel]
                order = np.argsort(-d_scores, kind='stable')
                matched = np.zeros(len(gts), bool)
                ious = det_gt_iou(d_boxes, gts,
                                  np.zeros(len(gts), bool)) if len(gts) \
                    else np.zeros((len(d_boxes), 0))
                for d in order:
                    scores_all.append(float(d_scores[d]))
                    if len(gts) == 0:
                        tp_all.append(0)
                        continue
                    g = int(ious[d].argmax())
                    if ious[d, g] >= self.iou_thr:
                        if gt_ig[g]:
                            tp_all.append(-1)  # matched difficult: ignore
                        elif not matched[g]:
                            matched[g] = True
                            tp_all.append(1)
                        else:
                            tp_all.append(0)
                    else:
                        tp_all.append(0)
            if n_gt == 0:
                continue
            order = np.argsort(-np.asarray(scores_all), kind='stable')
            flags = np.asarray(tp_all)[order]
            keep = flags >= 0
            flags = flags[keep]
            tps = np.cumsum(flags == 1)
            fps = np.cumsum(flags == 0)
            recalls = tps / n_gt
            precisions = tps / np.maximum(tps + fps, np.spacing(1))
            ap = average_precision(recalls, precisions, self.mode)
            aps.append(ap)
            out[f'AP_{self.class_names[k]}'] = ap
        out['mAP'] = float(np.mean(aps)) if aps else 0.0
        return out
