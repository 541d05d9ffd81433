"""LVIS federated-protocol evaluator on hand-computable cases.

Pins the four LVIS-vs-COCO deviations (lvis_metric.py / LVISEval semantics):
unverified-category dets are dropped, neg_category_ids dets count as FPs,
not-exhaustive unmatched dets are ignored, and frequency-group APs.
"""
import os
import pickle

import numpy as np
import pytest

from erd_tpu.data.coco import ImageRecord
from erd_tpu.evaluation import (DetectionResult, DumpDetResults,
                                LvisMAPEvaluator)


def rec(img_id, boxes, labels, neg=(), nel=()):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    return ImageRecord(
        img_id=img_id, path='', width=1000, height=1000, bboxes=boxes,
        labels=np.asarray(labels, np.int32),
        ignore=np.zeros(n, bool),
        neg_labels=frozenset(neg), not_exhaustive_labels=frozenset(nel))


def det(img_id, boxes, scores, labels):
    return DetectionResult(img_id=img_id,
                           bboxes=np.asarray(boxes,
                                             np.float32).reshape(-1, 4),
                           scores=np.asarray(scores, np.float32),
                           labels=np.asarray(labels, np.int32))


def test_perfect_detections():
    gts = [rec(1, [[100, 100, 300, 300]], [0]),
           rec(2, [[0, 0, 50, 50]], [1])]
    ev = LvisMAPEvaluator(gts, num_classes=2, frequencies=['r', 'f'])
    ev.process(det(1, [[100, 100, 300, 300]], [0.9], [0]))
    ev.process(det(2, [[0, 0, 50, 50]], [0.7], [1]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(1.0)
    assert m['bbox_AR_300'] == pytest.approx(1.0)
    assert m['bbox_APr'] == pytest.approx(1.0)
    assert m['bbox_APf'] == pytest.approx(1.0)
    assert m['bbox_APc'] == -1.0  # no common categories


def test_unverified_category_det_is_dropped():
    # img 2 never verified cat 0 (not pos, not neg): the high-scoring wrong
    # det there must NOT penalize -> AP stays 1.0
    gts = [rec(1, [[0, 0, 100, 100]], [0]),
           rec(2, [[0, 0, 100, 100]], [1])]
    ev = LvisMAPEvaluator(gts, num_classes=2)
    ev.process(det(1, [[0, 0, 100, 100]], [0.8], [0]))
    ev.process(det(2, [[500, 500, 600, 600], [0, 0, 100, 100]],
                   [0.99, 0.7], [0, 1]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(1.0)


def test_neg_category_det_is_false_positive():
    # same layout, but img 2 verifies cat 0 as ABSENT: now the 0.99 det is
    # an FP ranked above the TP -> per-class AP for cat 0 drops to 0.5
    gts = [rec(1, [[0, 0, 100, 100]], [0]),
           rec(2, [[0, 0, 100, 100]], [1], neg=(0,))]
    ev = LvisMAPEvaluator(gts, num_classes=2)
    ev.process(det(1, [[0, 0, 100, 100]], [0.8], [0]))
    ev.process(det(2, [[500, 500, 600, 600], [0, 0, 100, 100]],
                   [0.99, 0.7], [0, 1]))
    m = ev.compute()
    assert m['bbox_mAP'] == pytest.approx(0.75, abs=1e-6)  # (0.5 + 1.0) / 2


def test_not_exhaustive_unmatched_det_ignored():
    # cat 0 marked not-exhaustive on img 1: unmatched extra det is ignored
    gt_ne = [rec(1, [[0, 0, 100, 100]], [0], nel=(0,))]
    ev = LvisMAPEvaluator(gt_ne, num_classes=1)
    ev.process(det(1, [[500, 500, 600, 600], [0, 0, 100, 100]],
                   [0.9, 0.8], [0, 0]))
    assert ev.compute()['bbox_mAP'] == pytest.approx(1.0)

    # control: without the flag the unmatched det is an FP -> AP 0.5
    gt_ex = [rec(1, [[0, 0, 100, 100]], [0])]
    ev = LvisMAPEvaluator(gt_ex, num_classes=1)
    ev.process(det(1, [[500, 500, 600, 600], [0, 0, 100, 100]],
                   [0.9, 0.8], [0, 0]))
    assert ev.compute()['bbox_mAP'] == pytest.approx(0.5, abs=1e-6)


def test_per_image_300_cap_keeps_top_scores():
    gts = [rec(1, [[0, 0, 100, 100]], [0])]
    ev = LvisMAPEvaluator(gts, num_classes=1)
    n = 310
    boxes = np.tile(np.array([[500, 500, 600, 600]], np.float32), (n, 1))
    scores = np.linspace(0.99, 0.01, n).astype(np.float32)
    # the TRUE match carries the LOWEST score; it must survive the cap
    # only if within the top 300 -> place it at rank 250
    boxes[250] = [0, 0, 100, 100]
    ev.process(DetectionResult(img_id=1, bboxes=boxes, scores=scores,
                               labels=np.zeros(n, np.int32)))
    stored = ev._results[1]
    assert len(stored.scores) == 300
    assert stored.scores.min() == pytest.approx(scores[299])
    m = ev.compute()
    assert m['bbox_mAP_50'] > 0  # the rank-250 TP survived


def test_frequency_groups_partition():
    # cat 0 rare + perfectly detected, cat 1 frequent + missed entirely
    gts = [rec(1, [[0, 0, 100, 100], [200, 200, 300, 300]], [0, 1])]
    ev = LvisMAPEvaluator(gts, num_classes=2, frequencies=['r', 'f'])
    ev.process(det(1, [[0, 0, 100, 100]], [0.9], [0]))
    m = ev.compute()
    assert m['bbox_APr'] == pytest.approx(1.0)
    assert m['bbox_APf'] == pytest.approx(0.0)
    assert m['bbox_mAP'] == pytest.approx(0.5)


def test_lvis_dataset_parses_federated_fields(tmp_path):
    import json

    from erd_tpu.data.lvis import LVISDataset
    ann = {
        'images': [{'id': 1, 'width': 100, 'height': 100,
                    'coco_url': 'http://x/val2017/000001.jpg',
                    'neg_category_ids': [7],
                    'not_exhaustive_category_ids': [3]}],
        'annotations': [{'id': 1, 'image_id': 1, 'category_id': 3,
                         'bbox': [10, 10, 30, 30], 'area': 900}],
        'categories': [{'id': 3, 'name': 'cat', 'frequency': 'r'},
                       {'id': 7, 'name': 'dog', 'frequency': 'f'}],
    }
    p = tmp_path / 'lvis.json'
    p.write_text(json.dumps(ann))
    ds = LVISDataset(str(p), test_mode=True)
    assert ds.frequencies == ['r', 'f']
    r = ds.records[0]
    assert r.neg_labels == frozenset({1})           # cat id 7 -> label 1
    assert r.not_exhaustive_labels == frozenset({0})
    assert r.path.endswith('val2017/000001.jpg')


def test_dump_det_results(tmp_path):
    from erd_tpu.structures.det_sample import DetResults, ImageMeta
    out = str(tmp_path / 'preds.pkl')
    dump = DumpDetResults(out)
    B, D = 2, 5
    det_results = DetResults(
        bboxes=np.arange(B * D * 4, dtype=np.float32).reshape(B, D, 4),
        scores=np.full((B, D), 0.5, np.float32),
        labels=np.zeros((B, D), np.int32),
        mask=np.array([[True, True, False, False, False]] * B))
    metas = ImageMeta(
        img_shape=np.full((B, 2), 100, np.float32),
        ori_shape=np.full((B, 2), 100, np.float32),
        scale_factor=np.ones((B, 2), np.float32),
        flip=np.zeros(B, bool),
        img_id=np.array([11, -1], np.int32),
        valid=np.array([True, False]))
    dump.process_batch(det_results, metas)
    res = dump.compute_metrics()
    assert res['num_images'] == 1.0
    with open(out, 'rb') as f:
        rows = pickle.load(f)
    assert len(rows) == 1 and rows[0]['img_id'] == 11
    assert rows[0]['bboxes'].shape == (2, 4)  # padding stripped
