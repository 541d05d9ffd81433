"""OpenImages challenge evaluation (AP@0.5 with the OID protocol).

Behavioural mirror of
/root/reference/mmdet/evaluation/metrics/openimages_metric.py +
functional/mean_ap.py (mode 'oid_v6'):
- *parent-class expansion*: every gt and every detection is duplicated
  into its hierarchy ancestors via the dataset's relation matrix
  (:66-146) before matching;
- *verified-label filtering*: when image-level labels are supplied, only
  classes verified for the image are evaluated (detections of unverified
  classes are dropped rather than counted as FP);
- *group-of handling*: a detection whose IoA (intersection over the
  DETECTION's area... the protocol uses intersection over the detection
  box vs the group box) with a group-of gt exceeds ``ioa_thr``(=0.5) is
  matched to the group: the first (highest-score) match is the group's
  single TP, later matches are ignored;
- per-class AP is the VOC continuous (all-point) interpolation at
  IoU 0.5; the headline is the class mean over classes with gts.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from .crowdhuman_metric import _iof_matrix, _iou_matrix


class OpenImagesMetric:

    def __init__(self, num_classes, relation_matrix=None, iou_thr=0.5,
                 ioa_thr=0.5):
        self.num_classes = num_classes
        self.rel = relation_matrix if relation_matrix is not None else \
            np.eye(num_classes, dtype=bool)
        self.iou_thr = iou_thr
        self.ioa_thr = ioa_thr
        self._scores = defaultdict(list)
        self._flags = defaultdict(list)
        self._gt_counts = np.zeros(num_classes, np.int64)

    def _expand(self, boxes, labels, *extra):
        """Duplicate rows into ancestor classes via the relation matrix."""
        out_b, out_l = [], []
        out_extra = [[] for _ in extra]
        for i, lab in enumerate(labels):
            for anc in np.flatnonzero(self.rel[lab]):
                out_b.append(boxes[i])
                out_l.append(anc)
                for j, e in enumerate(extra):
                    out_extra[j].append(e[i])
        b = np.asarray(out_b, np.float32).reshape(-1, 4)
        l = np.asarray(out_l, np.int64)
        return (b, l) + tuple(np.asarray(e) for e in out_extra)

    def process(self, det_boxes, det_scores, det_labels, gt_boxes,
                gt_labels, group_of=None, verified_labels=None):
        det_boxes = np.asarray(det_boxes).reshape(-1, 4)
        det_scores = np.asarray(det_scores)
        det_labels = np.asarray(det_labels, np.int64)
        gt_boxes = np.asarray(gt_boxes).reshape(-1, 4)
        gt_labels = np.asarray(gt_labels, np.int64)
        group_of = np.zeros(len(gt_boxes), bool) if group_of is None \
            else np.asarray(group_of, bool)

        gt_boxes, gt_labels, group_of = self._expand(gt_boxes, gt_labels,
                                                     group_of)
        det_boxes, det_labels, det_scores = self._expand(
            det_boxes, det_labels, det_scores)

        if verified_labels is not None:
            verified = set()
            for v in verified_labels:
                verified.update(np.flatnonzero(self.rel[v]).tolist())
            keep = np.asarray([l in verified for l in det_labels], bool)
            det_boxes, det_labels, det_scores = (det_boxes[keep],
                                                 det_labels[keep],
                                                 det_scores[keep])
            keepg = np.asarray([l in verified for l in gt_labels], bool)
            gt_boxes, gt_labels, group_of = (gt_boxes[keepg],
                                             gt_labels[keepg],
                                             group_of[keepg])

        for c in np.unique(gt_labels):
            self._gt_counts[c] += int(
                ((gt_labels == c) & ~group_of).sum() +
                ((gt_labels == c) & group_of).sum())

        for c in np.unique(np.concatenate([det_labels, gt_labels])) \
                if len(det_labels) + len(gt_labels) else []:
            db = det_boxes[det_labels == c]
            ds = det_scores[det_labels == c]
            gb = gt_boxes[(gt_labels == c) & ~group_of]
            grp = gt_boxes[(gt_labels == c) & group_of]
            order = np.argsort(-ds)
            matched = np.zeros(len(gb), bool)
            grp_matched = np.zeros(len(grp), bool)
            iou = _iou_matrix(db, gb)
            ioa = _iof_matrix(db, grp)
            for i in order:
                if len(gb):
                    row = iou[i].copy()
                    row[matched] = -1
                    j = row.argmax()
                    if row[j] >= self.iou_thr:
                        matched[j] = True
                        self._scores[c].append(ds[i])
                        self._flags[c].append(1)
                        continue
                if len(grp) and ioa[i].max() >= self.ioa_thr:
                    j = ioa[i].argmax()
                    if not grp_matched[j]:
                        grp_matched[j] = True
                        self._scores[c].append(ds[i])
                        self._flags[c].append(1)
                    # later dets in the same group: ignored
                    continue
                self._scores[c].append(ds[i])
                self._flags[c].append(0)

    def compute(self):
        aps = {}
        for c in range(self.num_classes):
            if self._gt_counts[c] == 0:
                continue
            scores = np.asarray(self._scores.get(c, []))
            flags = np.asarray(self._flags.get(c, []), np.int64)
            order = np.argsort(-scores)
            flags = flags[order]
            tp = np.cumsum(flags)
            fp = np.cumsum(1 - flags)
            recall = tp / self._gt_counts[c]
            precision = tp / np.clip(tp + fp, 1, None)
            mrec = np.concatenate([[0.0], recall])
            mpre = np.concatenate([[0.0], precision])
            for k in range(len(mpre) - 2, -1, -1):
                mpre[k] = max(mpre[k], mpre[k + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            aps[c] = float(((mrec[idx + 1] - mrec[idx]) *
                            mpre[idx + 1]).sum())
        mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
        return dict(mAP=mean_ap, classwise=aps)
