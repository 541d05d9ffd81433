"""Evaluator correctness on hand-computable cases (the oracle pycocotools is
not installed; these pin the protocol invariants)."""
import numpy as np
import pytest

from erd_tpu.data.coco import ImageRecord
from erd_tpu.evaluation import CocoMAPEvaluator, DetectionResult


def rec(img_id, boxes, labels, ignore=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    return ImageRecord(
        img_id=img_id, path='', width=1000, height=1000, bboxes=boxes,
        labels=np.asarray(labels, np.int32),
        ignore=np.asarray(ignore if ignore is not None else [False] * n,
                          bool))


def det(img_id, boxes, scores, labels):
    return DetectionResult(img_id=img_id,
                           bboxes=np.asarray(boxes, np.float32).reshape(-1,
                                                                        4),
                           scores=np.asarray(scores, np.float32),
                           labels=np.asarray(labels, np.int32))


def test_perfect_detections():
    gts = [rec(1, [[100, 100, 300, 300], [400, 400, 500, 600]], [0, 1]),
           rec(2, [[0, 0, 50, 50]], [0])]
    ev = CocoMAPEvaluator(gts, num_classes=2)
    ev.process(det(1, [[100, 100, 300, 300], [400, 400, 500, 600]],
                   [0.9, 0.8], [0, 1]))
    ev.process(det(2, [[0, 0, 50, 50]], [0.7], [0]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(1.0)
    assert m['bbox_mAP_50'] == pytest.approx(1.0)
    assert m['bbox_AR_100'] == pytest.approx(1.0)


def test_iou_06_matches_three_thresholds():
    # det overlaps gt with IoU exactly 0.6: counts for thr 0.5/0.55/0.6 only
    gt_box = [0, 0, 100, 100]
    det_box = [0, 0, 100, 60]  # inter 6000, union 10000 -> IoU 0.6
    ev = CocoMAPEvaluator([rec(1, [gt_box], [0])], num_classes=1)
    ev.process(det(1, [det_box], [0.9], [0]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(0.3, abs=1e-6)
    assert m['bbox_mAP_50'] == pytest.approx(1.0)
    assert m['bbox_mAP_75'] == pytest.approx(0.0)


def test_fp_before_tp_halves_precision():
    ev = CocoMAPEvaluator([rec(1, [[0, 0, 100, 100]], [0])], num_classes=1)
    ev.process(det(1, [[500, 500, 600, 600], [0, 0, 100, 100]], [0.9, 0.8],
                   [0, 0]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(0.5, abs=1e-6)


def test_missed_gt_lowers_recall():
    gts = [rec(1, [[0, 0, 100, 100], [200, 200, 300, 300]], [0, 0])]
    ev = CocoMAPEvaluator(gts, num_classes=1)
    ev.process(det(1, [[0, 0, 100, 100]], [0.9], [0]))
    m = ev.compute()
    # one of two gts found at precision 1 -> AP = 0.5 (101-pt: recall<=0.5)
    assert m['bbox_mAP'] == pytest.approx(0.5, abs=0.01)
    assert m['bbox_AR_100'] == pytest.approx(0.5)


def test_crowd_gt_absorbs_without_fp():
    # det on a crowd region must not count as FP; the real gt is matched
    gts = [rec(1, [[0, 0, 100, 100], [200, 200, 400, 400]], [0, 0],
               ignore=[False, True])]
    ev = CocoMAPEvaluator(gts, num_classes=1)
    ev.process(det(1, [[0, 0, 100, 100], [210, 210, 260, 260]], [0.9, 0.8],
                   [0, 0]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(1.0)


def test_unannotated_class_excluded_from_mean():
    gts = [rec(1, [[0, 0, 100, 100]], [0])]
    ev = CocoMAPEvaluator(gts, num_classes=3)
    ev.process(det(1, [[0, 0, 100, 100]], [0.9], [0]))
    m = ev.compute(classwise=True)
    assert m['bbox_mAP'] == pytest.approx(1.0)  # classes 1,2 have no gt
    assert np.isnan(m['classwise']['1'])


def test_area_range_metrics():
    # a 20x20 box is 'small'; a 200x200 box is 'large'
    gts = [rec(1, [[0, 0, 20, 20], [100, 100, 300, 300]], [0, 0])]
    ev = CocoMAPEvaluator(gts, num_classes=1)
    ev.process(det(1, [[0, 0, 20, 20], [100, 100, 300, 300]], [0.9, 0.8],
                   [0, 0]))
    m = ev.compute()
    assert m['bbox_mAP_s'] == pytest.approx(1.0)
    assert m['bbox_mAP_l'] == pytest.approx(1.0)
    assert m['bbox_mAP_m'] == -1.0  # no medium gt


def test_maxdets_limit():
    # 1 gt, 11 dets, tp has the lowest score -> excluded at maxDet=10
    boxes = [[500 + 10 * i, 500, 540 + 10 * i, 540] for i in range(10)]
    boxes.append([0, 0, 100, 100])
    scores = [0.9 - 0.01 * i for i in range(10)] + [0.05]
    ev = CocoMAPEvaluator([rec(1, [[0, 0, 100, 100]], [0])], num_classes=1)
    ev.process(det(1, boxes, scores, [0] * 11))
    m = ev.compute()
    assert m['bbox_AR_10'] == pytest.approx(0.0)
    assert m['bbox_AR_100'] == pytest.approx(1.0)
