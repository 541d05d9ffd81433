"""COCO-style detection mAP evaluation in pure numpy.

pycocotools is not available in this environment, so this re-implements the
published COCO evaluation protocol (the semantics behind
/root/reference/mmdet/evaluation/metrics/coco_metric.py and its COCOeval
dependency): 10 IoU thresholds 0.50:0.05:0.95, area ranges
all/small/medium/large, maxDets (1, 10, 100), greedy score-ordered matching
with crowd/ignore handling (IoF for crowd), and 101-point interpolated
precision. Written from the protocol definition, not ported code.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..native import greedy_match_native as _greedy_match_native

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.round(np.linspace(0.0, 1.0, 101), 2)
AREA_RANGES = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0**2),
    'medium': (32.0**2, 96.0**2),
    'large': (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def det_gt_iou(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray):
    """(D, G) IoU; crowd gt columns use IoF (intersection / det area)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(iscrowd[None, :], area_d[:, None], union)
    return inter / np.maximum(union, 1e-10)


@dataclass
class _ImgEval:
    """Per (image, category) match state across IoU thresholds."""
    dt_scores: np.ndarray       # (D,)
    dt_matches: np.ndarray      # (T, D) matched gt id+1 or 0
    dt_ignore: np.ndarray       # (T, D) bool
    n_gt: int                   # non-ignored gt count (for this area range)


def _evaluate_img(dt_scores, ious, dt_areas, gt_areas, gt_ignore, gt_crowd,
                  area_rng, dt_force_ignore=False):
    """Greedy matching for one (img, cat, area-range); all IoU thrs at once.

    Detections arrive already score-sorted and maxDet-truncated, with
    ``ious`` rows in that order; ``*_areas`` carry box areas for bbox eval
    and mask pixel areas for segm eval (pycocotools uses the annotation
    'area' field, which is the segmentation area).
    """
    gt_ig = gt_ignore | (gt_areas < area_rng[0]) | (gt_areas > area_rng[1])

    # sort gts: non-ignored first (stable) so matching prefers real gts
    g_order = np.argsort(gt_ig, kind='stable')
    gt_ig = gt_ig[g_order]
    gt_crowd_s = gt_crowd[g_order]
    ious = ious[:, g_order]

    T = len(IOU_THRS)
    D = len(dt_scores)
    G = len(gt_ig)
    native = _greedy_match_native(
        IOU_THRS, ious.astype(np.float32), gt_ig.astype(np.uint8),
        gt_crowd_s.astype(np.uint8)) if D and G else None
    if native is not None:
        dtm, dt_ig = native
    else:
        dtm = np.zeros((T, D), np.int64)
        gtm = np.zeros((T, G), np.int64)
        dt_ig = np.zeros((T, D), bool)
        for ti, thr in enumerate(IOU_THRS):
            for d in range(D):
                best_iou = min(thr, 1 - 1e-10)
                best_g = -1
                for g in range(G):
                    if gtm[ti, g] and not gt_crowd_s[g]:
                        continue  # gt claimed (crowds can absorb many)
                    if best_g > -1 and not gt_ig[best_g] and gt_ig[g]:
                        break  # only ignored gts remain; keep real match
                    if ious[d, g] < best_iou:
                        continue
                    best_iou = ious[d, g]
                    best_g = g
                if best_g == -1:
                    continue
                dtm[ti, d] = best_g + 1
                gtm[ti, best_g] = d + 1
                dt_ig[ti, d] = gt_ig[best_g]

    # unmatched dets outside the area range are ignored, not false
    # positives; dt_force_ignore additionally ignores ALL unmatched dets
    # (LVIS not-exhaustive-category semantics, lvis eval dt_ig_mask)
    out_of_rng = (dt_areas < area_rng[0]) | (dt_areas > area_rng[1])
    dt_ig = dt_ig | ((dtm == 0) & (out_of_rng | dt_force_ignore)[None, :])

    return _ImgEval(dt_scores=dt_scores, dt_matches=dtm, dt_ignore=dt_ig,
                    n_gt=int((~gt_ig).sum()))


@dataclass
class DetectionResult:
    """Detections for one image, labels in dataset-contiguous space."""
    img_id: int
    bboxes: np.ndarray  # (n, 4) xyxy, original-image frame
    scores: np.ndarray
    labels: np.ndarray
    masks: Optional[list] = None  # per-det RLE dicts (segm metric only)


def _box_areas(boxes):
    if not len(boxes):
        return np.zeros((0,))
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


class CocoMAPEvaluator:
    """Accumulates DetectionResult objects and computes COCO metrics.

    Args:
        gt_records: iterable of data.coco.ImageRecord (ground truth). For
            ``metric='segm'`` the records must carry ``polygons`` (dataset
            built with with_mask=True) and results must carry ``masks``.
        num_classes: contiguous label count.
        class_names: optional names for the classwise table.
        metric: 'bbox' | 'segm' — matching IoU/areas use boxes or pasted
            instance masks (coco_metric.py:86 metric choices).
    """

    def __init__(self, gt_records, num_classes, class_names=None,
                 area_ranges=('all', 'small', 'medium', 'large'),
                 max_dets=MAX_DETS, metric='bbox'):
        assert metric in ('bbox', 'segm'), metric
        self.metric = metric
        self.num_classes = num_classes
        self.class_names = class_names or [str(i)
                                           for i in range(num_classes)]
        self.area_ranges = area_ranges
        self.max_dets = max_dets
        self.gt = {}
        for r in gt_records:
            self.gt[r.img_id] = r
        self._results: Dict[int, DetectionResult] = {}

    def process(self, result: DetectionResult):
        self._results[result.img_id] = result

    def _gt_rles(self, r):
        """Rasterize one image's gt polygons into RLEs (segm metric)."""
        from .mask_utils import polygons_to_bitmap, rle_encode
        assert r.polygons is not None, (
            'segm evaluation needs gt polygons (dataset with_mask=True)')
        return [rle_encode(polygons_to_bitmap(p, r.height, r.width))
                for p in r.polygons]

    def compute(self, classwise=False):
        img_ids = sorted(self.gt)
        K = self.num_classes
        area_names = list(self.area_ranges)
        # evals[(k, a)] -> list of _ImgEval
        max_det_eval = max(self.max_dets)
        evals: Dict[Tuple[int, str], List[_ImgEval]] = {
            (k, a): [] for k in range(K) for a in area_names}
        segm = self.metric == 'segm'
        if segm:
            from .mask_utils import mask_iou, rle_area

        for img_id in img_ids:
            r = self.gt[img_id]
            det = self._results.get(img_id)
            g_rles_all = self._gt_rles(r) if segm else None
            for k in range(K):
                if self._pair_skip(r, k):
                    # category not verified for this image (LVIS federated
                    # protocol): dets neither reward nor penalize
                    for a in area_names:
                        evals[(k, a)].append(None)
                    continue
                g_sel = np.nonzero(r.labels == k)[0]
                gt_boxes = r.bboxes[g_sel]
                gt_crowd = r.ignore[g_sel]
                if det is None:
                    d_boxes = np.zeros((0, 4))
                    d_scores = np.zeros((0,))
                    d_idx = np.zeros((0,), np.int64)
                else:
                    d_idx = np.nonzero(det.labels == k)[0]
                    d_boxes = det.bboxes[d_idx]
                    d_scores = det.scores[d_idx]
                if len(gt_boxes) == 0 and len(d_boxes) == 0:
                    for a in area_names:
                        evals[(k, a)].append(None)
                    continue
                # sort + truncate dets once; IoUs shared across area ranges
                order = np.argsort(-d_scores, kind='stable')[:max_det_eval]
                d_boxes = d_boxes[order]
                d_scores = d_scores[order]
                if segm:
                    d_rles = [det.masks[i] for i in d_idx[order]] \
                        if det is not None else []
                    g_rles = [g_rles_all[i] for i in g_sel]
                    ious = mask_iou(d_rles, g_rles, gt_crowd)
                    d_areas = np.asarray([rle_area(x) for x in d_rles],
                                         float)
                    g_areas = np.asarray([rle_area(x) for x in g_rles],
                                         float)
                else:
                    ious = det_gt_iou(d_boxes, gt_boxes, gt_crowd)
                    d_areas = _box_areas(d_boxes)
                    g_areas = _box_areas(gt_boxes)
                force_ig = self._dt_force_ignore(r, k)
                for a in area_names:
                    evals[(k, a)].append(
                        _evaluate_img(d_scores, ious, d_areas, g_areas,
                                      gt_crowd, gt_crowd, AREA_RANGES[a],
                                      dt_force_ignore=force_ig))

        T = len(IOU_THRS)
        R = len(RECALL_THRS)
        A = len(area_names)
        M = len(self.max_dets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for ki in range(K):
            for ai, a in enumerate(area_names):
                imgs = [e for e in evals[(ki, a)] if e is not None]
                if not imgs:
                    continue
                n_gt = sum(e.n_gt for e in imgs)
                if n_gt == 0:
                    continue
                for mi, md in enumerate(self.max_dets):
                    scores = np.concatenate(
                        [e.dt_scores[:md] for e in imgs])
                    order = np.argsort(-scores, kind='mergesort')
                    dtm = np.concatenate(
                        [e.dt_matches[:, :md] for e in imgs],
                        axis=1)[:, order]
                    dtig = np.concatenate(
                        [e.dt_ignore[:, :md] for e in imgs],
                        axis=1)[:, order]
                    tps = (dtm > 0) & ~dtig
                    fps = (dtm == 0) & ~dtig
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for ti in range(T):
                        tp = tp_sum[ti]
                        fp = fp_sum[ti]
                        nd = len(tp)
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                        # precision envelope (monotone decreasing)
                        q = np.zeros((R,))
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, RECALL_THRS, side='left')
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[ti, :, ki, ai, mi] = q

        return self._build_metrics(precision, recall, area_names, classwise)

    # --- hooks overridden by the LVIS evaluator (federated protocol) ---

    def _pair_skip(self, record, label) -> bool:
        """True to exclude this (image, category) pair from eval entirely."""
        return False

    def _dt_force_ignore(self, record, label) -> bool:
        """True to ignore (not penalize) all unmatched dets of the pair."""
        return False

    def _summarize(self, precision, recall, area_names, ap=True,
                   iou_thr=None, area='all', max_det=100):
        ai = area_names.index(area)
        mi = list(self.max_dets).index(max_det)
        if ap:
            s = precision[:, :, :, ai, mi]
            if iou_thr is not None:
                s = s[np.where(IOU_THRS == iou_thr)[0]]
        else:
            s = recall[:, :, ai, mi]
            if iou_thr is not None:
                s = s[np.where(IOU_THRS == iou_thr)[0]]
        s = s[s > -1]
        return float(s.mean()) if s.size else -1.0

    def _classwise_table(self, precision, area_names, max_det):
        table = {}
        ai = area_names.index('all')
        mi = list(self.max_dets).index(max_det)
        for ki, name in enumerate(self.class_names):
            s = precision[:, :, ki, ai, mi]
            s = s[s > -1]
            table[name] = float(s.mean()) if s.size else float('nan')
        return table

    def _build_metrics(self, precision, recall, area_names, classwise):
        def s(**kw):
            return self._summarize(precision, recall, area_names, **kw)

        p = self.metric
        metrics = {
            f'{p}_mAP': s(),
            f'{p}_mAP_50': s(iou_thr=0.5),
            f'{p}_mAP_75': s(iou_thr=0.75),
            f'{p}_mAP_s': s(area='small'),
            f'{p}_mAP_m': s(area='medium'),
            f'{p}_mAP_l': s(area='large'),
            f'{p}_AR_1': s(ap=False, max_det=1),
            f'{p}_AR_10': s(ap=False, max_det=10),
            f'{p}_AR_100': s(ap=False, max_det=100),
        }
        if classwise:
            metrics['classwise'] = self._classwise_table(
                precision, area_names, 100)
        return metrics
