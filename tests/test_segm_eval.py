"""Instance-segmentation evaluation: RLE, pasting, mask IoU, segm mAP.

Closes VERDICT r1 missing #2 (no way to score Mask R-CNN). Hand-computable
AP cases mirror the style of test_coco_eval.py's bbox cases.
"""
from dataclasses import dataclass

import numpy as np
import pytest

from erd_tpu.evaluation.coco_eval import (IOU_THRS, CocoMAPEvaluator,
                                          DetectionResult)
from erd_tpu.evaluation.mask_utils import (mask_iou, paste_mask,
                                           polygons_to_bitmap, rle_area,
                                           rle_decode, rle_encode,
                                           rle_to_string, string_to_rle)


# ---------------------------------------------------------------------------
# RLE
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', range(4))
def test_rle_roundtrip(seed):
    rs = np.random.RandomState(seed)
    m = rs.rand(23, 31) > rs.uniform(0.2, 0.8)
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle), m)
    assert rle_area(rle) == int(m.sum())
    # compressed-string roundtrip (pycocotools counts encoding)
    s = rle_to_string(rle)
    back = string_to_rle(s, 23, 31)
    np.testing.assert_array_equal(rle_decode(back), m)


def test_rle_empty_and_full():
    empty = np.zeros((5, 7), bool)
    full = np.ones((5, 7), bool)
    assert rle_area(rle_encode(empty)) == 0
    assert rle_area(rle_encode(full)) == 35
    np.testing.assert_array_equal(rle_decode(rle_encode(empty)), empty)
    np.testing.assert_array_equal(rle_decode(rle_encode(full)), full)


def test_rle_column_major():
    m = np.zeros((3, 2), bool)
    m[0, 0] = True  # first pixel in Fortran order
    counts = rle_encode(m)['counts']
    np.testing.assert_array_equal(counts, [0, 1, 5])


# ---------------------------------------------------------------------------
# Mask IoU
# ---------------------------------------------------------------------------
def test_mask_iou_and_crowd_iof():
    a = np.zeros((10, 10), bool)
    a[0:4, 0:4] = True  # 16 px
    b = np.zeros((10, 10), bool)
    b[2:6, 0:4] = True  # 16 px, overlap 8
    big = np.zeros((10, 10), bool)
    big[0:8, 0:8] = True  # covers a entirely
    ra, rb, rbig = rle_encode(a), rle_encode(b), rle_encode(big)
    iou = mask_iou([ra], [rb], np.array([False]))
    np.testing.assert_allclose(iou[0, 0], 8 / 24)
    # crowd: intersection / det area
    iof = mask_iou([ra], [rbig], np.array([True]))
    np.testing.assert_allclose(iof[0, 0], 1.0)


# ---------------------------------------------------------------------------
# Pasting
# ---------------------------------------------------------------------------
def test_paste_mask_full_box():
    """A constant-1 mask pastes (approximately) the box interior."""
    m = np.ones((28, 28), np.float32)
    out = paste_mask(m, np.asarray([4.0, 6.0, 20.0, 18.0]), 32, 32)
    # interior fully on
    assert out[7:17, 5:19].all()
    # well outside the box: off
    assert not out[:5].any() and not out[20:].any()
    assert not out[:, :3].any() and not out[:, 22:].any()


def test_paste_mask_half():
    """Left-half mask lights only the left half of the box."""
    m = np.zeros((28, 28), np.float32)
    m[:, :14] = 1.0
    out = paste_mask(m, np.asarray([0.0, 0.0, 16.0, 16.0]), 16, 16)
    assert out[2:14, 2:6].all()
    assert not out[:, 9:].any()


# ---------------------------------------------------------------------------
# segm mAP (hand-computable)
# ---------------------------------------------------------------------------
@dataclass
class _Rec:
    img_id: int
    height: int
    width: int
    bboxes: np.ndarray
    labels: np.ndarray
    ignore: np.ndarray
    polygons: list


def _rect_poly(x1, y1, x2, y2):
    return [np.asarray([x1, y1, x2, y1, x2, y2, x1, y2], np.float32)]


def _rect_mask(h, w, x1, y1, x2, y2):
    m = np.zeros((h, w), bool)
    m[y1:y2 + 1, x1:x2 + 1] = True  # inclusive, matching fillPoly corners
    return m


def test_segm_map_exact_match():
    rec = _Rec(img_id=1, height=20, width=20,
               bboxes=np.asarray([[2., 2., 10., 10.]]),
               labels=np.asarray([0]), ignore=np.asarray([False]),
               polygons=[_rect_poly(2, 2, 10, 10)])
    ev = CocoMAPEvaluator([rec], num_classes=1, metric='segm')
    det_mask = polygons_to_bitmap(_rect_poly(2, 2, 10, 10), 20, 20)
    ev.process(DetectionResult(
        img_id=1, bboxes=np.asarray([[2., 2., 10., 10.]]),
        scores=np.asarray([0.9]), labels=np.asarray([0]),
        masks=[rle_encode(det_mask)]))
    m = ev.compute()
    np.testing.assert_allclose(m['segm_mAP'], 1.0)
    np.testing.assert_allclose(m['segm_AR_100'], 1.0)


def test_segm_map_partial_overlap():
    """AP equals the fraction of IoU thresholds the single match clears,
    and differs from the bbox result (same boxes, different masks)."""
    gt_mask = _rect_mask(20, 20, 2, 2, 10, 10)
    det_mask = _rect_mask(20, 20, 2, 2, 10, 6)  # partial vertical cover
    inter = (gt_mask & det_mask).sum()
    iou = inter / (gt_mask.sum() + det_mask.sum() - inter)
    expected = float(np.mean([iou >= t for t in IOU_THRS]))

    rec = _Rec(img_id=1, height=20, width=20,
               bboxes=np.asarray([[2., 2., 10., 10.]]),
               labels=np.asarray([0]), ignore=np.asarray([False]),
               polygons=[_rect_poly(2, 2, 10, 10)])
    ev = CocoMAPEvaluator([rec], num_classes=1, metric='segm')
    ev.process(DetectionResult(
        img_id=1, bboxes=np.asarray([[2., 2., 10., 10.]]),  # bbox exact!
        scores=np.asarray([0.9]), labels=np.asarray([0]),
        masks=[rle_encode(det_mask)]))
    m = ev.compute()
    np.testing.assert_allclose(m['segm_mAP'], expected)

    ev_box = CocoMAPEvaluator([rec], num_classes=1, metric='bbox')
    ev_box.process(DetectionResult(
        img_id=1, bboxes=np.asarray([[2., 2., 10., 10.]]),
        scores=np.asarray([0.9]), labels=np.asarray([0])))
    np.testing.assert_allclose(ev_box.compute()['bbox_mAP'], 1.0)


def test_segm_crowd_gt_absorbs_without_penalty():
    """A det matching only a crowd gt is ignored, not a false positive."""
    rec = _Rec(img_id=1, height=20, width=20,
               bboxes=np.asarray([[0., 0., 16., 16.], [2., 2., 6., 6.]]),
               labels=np.asarray([0, 0]),
               ignore=np.asarray([True, False]),  # first is crowd
               polygons=[_rect_poly(0, 0, 16, 16), _rect_poly(2, 2, 6, 6)])
    ev = CocoMAPEvaluator([rec], num_classes=1, metric='segm')
    ev.process(DetectionResult(
        img_id=1,
        bboxes=np.asarray([[2., 2., 6., 6.], [10., 10., 14., 14.]]),
        scores=np.asarray([0.9, 0.8]), labels=np.asarray([0, 0]),
        masks=[rle_encode(polygons_to_bitmap(_rect_poly(2, 2, 6, 6),
                                             20, 20)),
               rle_encode(polygons_to_bitmap(_rect_poly(10, 10, 14, 14),
                                             20, 20))]))
    m = ev.compute()
    # real gt matched perfectly; second det absorbed by the crowd
    np.testing.assert_allclose(m['segm_mAP'], 1.0)
