"""Analysis tooling: confusion matrix, per-image AP ranking, offline
re-eval (tools/analysis_tools parity)."""
import pickle
import numpy as np
import pytest

from erd_tpu.evaluation.analysis import (confusion_matrix, eval_dumped,
                                         per_image_scores)


class _Rec:
    def __init__(self, img_id, boxes, labels):
        self.img_id = img_id
        self.bboxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        self.labels = np.asarray(labels, np.int32)
        self.ignore = np.zeros(len(self.labels), bool)
        self.width = 100
        self.height = 100
        self.path = ''


def _dataset():
    return [
        _Rec(1, [[0, 0, 10, 10], [50, 50, 70, 70]], [0, 1]),
        _Rec(2, [[20, 20, 40, 40]], [1]),
    ]


def test_confusion_matrix_counts():
    results = [
        dict(img_id=1,
             bboxes=np.asarray([[0., 0., 10., 10.],     # correct cls 0
                                [50., 50., 70., 70.],   # WRONG cls (0)
                                [90., 90., 99., 99.]]),  # bg FP
             scores=np.asarray([0.9, 0.8, 0.7]),
             labels=np.asarray([0, 0, 1])),
        dict(img_id=2, bboxes=np.zeros((0, 4)),
             scores=np.zeros(0), labels=np.zeros(0, np.int64)),
    ]
    cm = confusion_matrix(results, _dataset(), num_classes=2,
                          score_thr=0.3)
    assert cm[0, 0] == 1            # gt 0 -> det 0
    assert cm[1, 0] == 1            # gt 1 matched by a class-0 det
    assert cm[1, 2] == 1            # img2's gt 1 missed -> background col
    assert cm[2, 1] == 1            # unmatched det -> background row


def test_per_image_scores_ranks_quality():
    good = dict(img_id=1,
                bboxes=np.asarray([[0., 0., 10., 10.],
                                   [50., 50., 70., 70.]]),
                scores=np.asarray([0.9, 0.8]),
                labels=np.asarray([0, 1]))
    bad = dict(img_id=2, bboxes=np.asarray([[80., 80., 99., 99.]]),
               scores=np.asarray([0.9]), labels=np.asarray([1]))
    s = per_image_scores([good, bad], _dataset())
    assert s[1] == pytest.approx(1.0)
    assert s[2] == pytest.approx(0.0)
    assert s[1] > s[2]


def test_eval_dumped_roundtrip(tmp_path):
    import json
    from erd_tpu.data import CocoDataset
    ann = dict(
        images=[dict(id=1, file_name='a.jpg', width=100, height=100)],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[0, 0, 10, 10], area=100, iscrowd=0)],
        categories=[dict(id=1, name='person')])
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(ann))
    ds = CocoDataset(str(p), classes=('person',), test_mode=True)
    rows = [dict(img_id=1, bboxes=np.asarray([[0., 0., 10., 10.]]),
                 scores=np.asarray([0.9]), labels=np.asarray([0]))]
    pk = tmp_path / 'dets.pkl'
    with open(pk, 'wb') as f:
        pickle.dump(rows, f)
    metrics = eval_dumped(str(pk), ds, 1)
    assert metrics['bbox_mAP_50'] == pytest.approx(1.0)


def test_coco_error_analysis_monotone_and_values():
    from erd_tpu.evaluation.analysis import coco_error_analysis
    # class 0: one gt; det slightly off (IoU ~0.68: >0.5 but <0.75) plus
    # a background FP. class 1: one gt hit exactly, plus a det that
    # overlaps class 0's gt (class confusion).
    ds = [_Rec(1, [[0, 0, 20, 20], [50, 50, 70, 70]], [0, 1])]
    results = [dict(
        img_id=1,
        bboxes=np.asarray([[0., 0., 20., 14.],     # cls0, loc error
                           [80., 80., 95., 95.],   # cls0, bg FP
                           [50., 50., 70., 70.],   # cls1, perfect
                           [2., 2., 20., 20.]]),   # cls1 on cls0's gt
        scores=np.asarray([0.9, 0.8, 0.95, 0.85]),
        labels=np.asarray([0, 0, 1, 1]))]
    t = coco_error_analysis(results, ds, num_classes=2)
    for c in (0, 1):
        row = t[c]
        # the defining invariant: progressively forgiving errors can
        # only raise AP
        assert (row['C75'] <= row['C50'] <= row['Loc'] <= row['Oth']
                <= row['BG'] <= row['FN'] == 1.0)
    # class 0: miss at 0.75, hit at 0.5 (but the bg FP costs nothing as
    # it ranks after the TP), perfect once FPs dropped
    assert t[0]['C75'] == pytest.approx(0.0)
    assert t[0]['C50'] == pytest.approx(1.0)
    assert t[0]['BG'] == pytest.approx(1.0)
    # class 1: strict AP already 1.0 — the confused det ranks second and
    # the single gt is matched by the perfect det first
    assert t[1]['C75'] == pytest.approx(1.0)
    assert t[1]['FN'] == 1.0
    assert t['mean']['C75'] == pytest.approx(0.5)
