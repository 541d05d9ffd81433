"""LVIS v1 evaluation (federated AP protocol) in pure numpy.

Re-implements the semantics behind
/root/reference/mmdet/evaluation/metrics/lvis_metric.py, which delegates to
the lvis-api's LVISEval. The protocol differs from COCO in four ways:

1. **Federated annotations**: each image only verifies a subset of the 1203
   categories. A detection of category c on image i only counts if c is
   *positively* annotated on i (has gt) or listed in i's
   ``neg_category_ids`` (verified absent). Otherwise it is dropped — it
   neither rewards nor penalizes (lvis eval _prepare: dts whose category is
   in neither img_pl nor img_nl are skipped).
2. **Not-exhaustive categories**: if c is in ``not_exhaustive_category_ids``
   of i (gt present but known incomplete), *unmatched* detections of c on i
   are ignored rather than counted as false positives (dt_ig_mask).
3. **max_dets = 300 per image across all categories** (LVISResults caps
   result lists per image; there is no 1/10/100 sweep — AR is AR@300).
4. **Frequency-group APs**: APr / APc / APf over categories whose
   ``frequency`` is 'r' / 'c' / 'f' (rare: <10 train images, common: 10-100,
   frequent: >100).

There is no crowd handling — LVIS has no iscrowd; gt ``ignore`` flags are
still honored through the shared matching kernel.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from .coco_eval import CocoMAPEvaluator, DetectionResult
from .coco_metric import CocoMetric


class LvisMAPEvaluator(CocoMAPEvaluator):
    """Accumulates DetectionResult objects and computes LVIS metrics.

    Args:
        frequencies: per-contiguous-label frequency codes ('r'/'c'/'f'),
            e.g. ``LVISDataset.frequencies``. Missing -> APr/APc/APf skip
            empty groups (reported as -1 like empty COCO categories).
    """

    def __init__(self, gt_records, num_classes, class_names=None,
                 frequencies: Optional[Sequence[str]] = None,
                 max_dets=(300,), metric='bbox'):
        super().__init__(gt_records, num_classes, class_names=class_names,
                         max_dets=max_dets, metric=metric)
        self.frequencies = list(frequencies) if frequencies else []
        # per-image positive label set (categories with gt on the image)
        self._pos = {r.img_id: frozenset(np.unique(r.labels).tolist())
                     for r in self.gt.values()}

    def process(self, result: DetectionResult):
        # LVIS caps detections at 300 per image ACROSS categories
        cap = max(self.max_dets)
        if len(result.scores) > cap:
            order = np.argsort(-result.scores, kind='stable')[:cap]
            result = DetectionResult(
                img_id=result.img_id,
                bboxes=result.bboxes[order],
                scores=result.scores[order],
                labels=result.labels[order],
                masks=[result.masks[i] for i in order]
                if result.masks is not None else None)
        super().process(result)

    def _pair_skip(self, record, label):
        return (label not in self._pos[record.img_id]
                and label not in record.neg_labels)

    def _dt_force_ignore(self, record, label):
        return label in record.not_exhaustive_labels

    def _build_metrics(self, precision, recall, area_names, classwise):
        cap = max(self.max_dets)

        def s(**kw):
            kw.setdefault('max_det', cap)
            return self._summarize(precision, recall, area_names, **kw)

        p = self.metric
        metrics = {
            f'{p}_mAP': s(),
            f'{p}_mAP_50': s(iou_thr=0.5),
            f'{p}_mAP_75': s(iou_thr=0.75),
            f'{p}_mAP_s': s(area='small'),
            f'{p}_mAP_m': s(area='medium'),
            f'{p}_mAP_l': s(area='large'),
            f'{p}_AR_{cap}': s(ap=False),
        }
        ai = area_names.index('all')
        mi = list(self.max_dets).index(cap)
        for grp in 'rcf':
            labels = [i for i, f in enumerate(self.frequencies) if f == grp]
            sel = precision[:, :, labels, ai, mi]
            sel = sel[sel > -1]
            metrics[f'{p}_AP{grp}'] = (float(sel.mean()) if sel.size
                                       else -1.0)
        if classwise:
            metrics['classwise'] = self._classwise_table(
                precision, area_names, cap)
        return metrics


class LVISMetric(CocoMetric):
    """LVIS front-end: padded device results -> numpy -> federated mAP.

    Same accumulation path as CocoMetric (unpad, paste masks, json dump);
    only the evaluator protocol differs (lvis_metric.py:32 default_prefix
    'lvis'; metric keys mirror LVISEval AP/APr/APc/APf/AR@300).
    """

    def __init__(self, dataset, classwise: bool = False,
                 outfile_prefix: Optional[str] = None,
                 metrics: Union[str, Sequence[str]] = ('bbox',)):
        super().__init__(dataset, classwise=classwise,
                         outfile_prefix=outfile_prefix, metrics=metrics)
        self.evaluators = {
            m: LvisMAPEvaluator(
                dataset.records, dataset.num_classes,
                class_names=list(dataset.label_names),
                frequencies=getattr(dataset, 'frequencies', None),
                metric=m)
            for m in self.metrics}
