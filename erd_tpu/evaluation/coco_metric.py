"""CocoMetric front-end: padded device results -> numpy -> mAP.

Mirrors the roles of /root/reference/mmdet/evaluation/metrics/coco_metric.py:
``process`` accumulates per-image detections (here: fixed-size masked arrays
straight off the TPU), ``compute_metrics`` runs the evaluator(s) and
optionally prints the classwise AP table (:513) and dumps COCO-format json
results (results2json :206, xyxy->xywh :186-204; segm results carry
pycocotools-compatible compressed RLE 'counts' strings). metric='segm'
pastes the device's 28x28 probability masks into the original image frame
(fcn_mask_head.py:278-400) before scoring.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..data.coco import CocoDataset
from .coco_eval import CocoMAPEvaluator, DetectionResult


class CocoMetric:

    def __init__(self, dataset: CocoDataset, classwise: bool = False,
                 outfile_prefix: Optional[str] = None,
                 metrics: Union[str, Sequence[str]] = ('bbox',)):
        if isinstance(metrics, str):
            metrics = (metrics,)
        assert all(m in ('bbox', 'segm', 'proposal_fast')
                   for m in metrics), metrics
        self.dataset = dataset
        self.metrics = tuple(metrics)
        self.classwise = classwise
        self.outfile_prefix = outfile_prefix
        self.evaluators = {
            m: CocoMAPEvaluator(dataset.records, dataset.num_classes,
                                class_names=list(dataset.label_names),
                                metric=m)
            for m in self.metrics if m != 'proposal_fast'}
        # proposal_fast (coco_metric.py:145-184): class-agnostic AR via
        # eval_recalls on the raw boxes (no category matching)
        self._proposal_rows: Dict[int, np.ndarray] = {}
        self._json_rows: Dict[str, List[dict]] = {m: [] for m in
                                                  self.metrics}
        self._ori_shapes = {r.img_id: (r.height, r.width)
                            for r in dataset.records}

    def process_batch(self, det_results, metas, masks=None):
        """Accumulate one padded batch of DetResults + ImageMeta.

        Args:
            masks: optional (B, D, m, m) device probability masks (from
                MaskRCNNDetector.predict) — required when 'segm' is active.
        """
        bboxes = np.asarray(det_results.bboxes)
        scores = np.asarray(det_results.scores)
        labels = np.asarray(det_results.labels)
        mask = np.asarray(det_results.mask)
        img_ids = np.asarray(metas.img_id)
        valid = np.asarray(metas.valid)
        if 'segm' in self.metrics:
            assert masks is not None, 'segm metric needs device masks'
            masks_np = np.asarray(masks, np.float32)
        for i in range(len(img_ids)):
            if not valid[i] or img_ids[i] < 0:
                continue  # batch padding slot
            m = mask[i]
            img_id = int(img_ids[i])
            rles = None
            if 'segm' in self.metrics:
                from .mask_utils import paste_masks, rle_encode
                h, w = self._ori_shapes[img_id]
                bitmaps = paste_masks(masks_np[i][m], bboxes[i][m], h, w)
                rles = [rle_encode(b) for b in bitmaps]
            res = DetectionResult(img_id=img_id, bboxes=bboxes[i][m],
                                  scores=scores[i][m], labels=labels[i][m],
                                  masks=rles)
            self._record(res)

    def process_result(self, img_id, bboxes, scores, labels, masks=None):
        """Accumulate one image's unpadded results (offline re-eval path,
        reference tools/analysis_tools/eval_metric.py)."""
        res = DetectionResult(
            img_id=int(img_id), bboxes=np.asarray(bboxes, np.float32),
            scores=np.asarray(scores, np.float32),
            labels=np.asarray(labels, np.int64), masks=masks)
        self._record(res)

    def _record(self, res: DetectionResult):
        """Shared accumulation for both the padded-batch path (standard
        evaluation, train_loop.run_evaluation) and the per-image offline
        path — keeps proposal_fast AR populated in BOTH, matching the
        reference where CocoMetric.process feeds every metric mode."""
        for ev in self.evaluators.values():
            ev.process(res)
        if 'proposal_fast' in self.metrics:
            order = np.argsort(-res.scores)
            self._proposal_rows[res.img_id] = np.concatenate(
                [res.bboxes[order], res.scores[order][:, None]], axis=1)
        if self.outfile_prefix is not None:
            self._collect_json(res)

    def _collect_json(self, res: DetectionResult):
        for j, (b, s, l) in enumerate(zip(res.bboxes, res.scores,
                                          res.labels)):
            row = {
                'image_id': res.img_id,
                'bbox': [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                'score': float(s),
                'category_id': int(self.dataset.cat_ids[int(l)]),
            }
            if 'bbox' in self.metrics:
                self._json_rows['bbox'].append(row)
            if 'segm' in self.metrics and res.masks is not None:
                from .mask_utils import rle_to_string
                rle = res.masks[j]
                self._json_rows['segm'].append(
                    dict(row, segmentation={
                        'size': rle['size'],
                        'counts': rle_to_string(rle)}))

    def compute_metrics(self) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        if 'proposal_fast' in self.metrics:
            from .recall import eval_recalls
            gts, props = [], []
            for rec in self.dataset.records:
                gb = rec.bboxes[~rec.ignore] if len(rec.bboxes) \
                    else rec.bboxes.reshape(-1, 4)
                gts.append(gb)
                props.append(self._proposal_rows.get(
                    rec.img_id, np.zeros((0, 5), np.float32)))
            nums = (100, 300, 1000)
            recalls = eval_recalls(
                gts, props, proposal_nums=nums,
                iou_thrs=np.arange(0.5, 0.96, 0.05))
            ar = recalls.mean(axis=1)
            for k, n in enumerate(nums):
                metrics[f'AR@{n}'] = float(round(ar[k], 4))
        for name, ev in self.evaluators.items():
            if self.outfile_prefix is not None:
                with open(f'{self.outfile_prefix}.{name}.json', 'w') as f:
                    json.dump(self._json_rows[name], f)
            out = ev.compute(classwise=self.classwise)
            cw = out.pop('classwise', None)
            metrics.update(out)
            if self.classwise and cw is not None:
                rows = sorted(cw.items())
                width = max(len(n) for n, _ in rows) + 2
                lines = [f'classwise {name} AP@[.5:.95]:']
                for n, v in rows:
                    lines.append(f'  {n:<{width}} {v:.3f}')
                metrics[f'classwise_table_{name}'] = '\n'.join(lines)
                metrics.setdefault('classwise_table',
                                   metrics[f'classwise_table_{name}'])
                if name == 'bbox':
                    metrics['classwise'] = cw
        return metrics
