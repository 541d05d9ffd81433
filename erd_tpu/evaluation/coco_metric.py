"""CocoMetric front-end: padded device results -> numpy -> mAP.

Mirrors the roles of /root/reference/mmdet/evaluation/metrics/coco_metric.py:
``process`` accumulates per-image detections (here: fixed-size masked arrays
straight off the TPU), ``compute_metrics`` runs the evaluator and optionally
prints the classwise AP table (:513) and dumps COCO-format json results
(results2json :206, xyxy->xywh :186-204).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from ..data.coco import CocoDataset
from .coco_eval import CocoMAPEvaluator, DetectionResult


class CocoMetric:

    def __init__(self, dataset: CocoDataset, classwise: bool = False,
                 outfile_prefix: Optional[str] = None):
        self.dataset = dataset
        self.classwise = classwise
        self.outfile_prefix = outfile_prefix
        self.evaluator = CocoMAPEvaluator(
            dataset.records, dataset.num_classes,
            class_names=list(dataset.label_names))
        self._json_rows: List[dict] = []

    def process_batch(self, det_results, metas):
        """Accumulate one padded batch of DetResults + ImageMeta (numpy-able)."""
        bboxes = np.asarray(det_results.bboxes)
        scores = np.asarray(det_results.scores)
        labels = np.asarray(det_results.labels)
        mask = np.asarray(det_results.mask)
        img_ids = np.asarray(metas.img_id)
        valid = np.asarray(metas.valid)
        for i in range(len(img_ids)):
            if not valid[i] or img_ids[i] < 0:
                continue  # batch padding slot
            m = mask[i]
            res = DetectionResult(img_id=int(img_ids[i]),
                                  bboxes=bboxes[i][m], scores=scores[i][m],
                                  labels=labels[i][m])
            self.evaluator.process(res)
            if self.outfile_prefix is not None:
                self._collect_json(res)

    def _collect_json(self, res: DetectionResult):
        for b, s, l in zip(res.bboxes, res.scores, res.labels):
            self._json_rows.append({
                'image_id': res.img_id,
                'bbox': [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                'score': float(s),
                'category_id': int(self.dataset.cat_ids[int(l)]),
            })

    def compute_metrics(self) -> Dict[str, float]:
        if self.outfile_prefix is not None:
            with open(self.outfile_prefix + '.bbox.json', 'w') as f:
                json.dump(self._json_rows, f)
        metrics = self.evaluator.compute(classwise=self.classwise)
        if self.classwise and 'classwise' in metrics:
            rows = sorted(metrics['classwise'].items())
            width = max(len(n) for n, _ in rows) + 2
            lines = ['classwise AP@[.5:.95]:']
            for n, v in rows:
                lines.append(f'  {n:<{width}} {v:.3f}')
            metrics['classwise_table'] = '\n'.join(lines)
        return metrics
