"""Native C++ greedy-match kernel: builds, matches the python reference
matcher bit-for-bit, and is actually used by the evaluator."""
import numpy as np
import pytest

from erd_tpu.native import greedy_match_native, load_coco_match
from erd_tpu.evaluation.coco_eval import IOU_THRS


def py_greedy(iou_thrs, ious, gt_ig, gt_crowd):
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dtig = np.zeros((T, D), bool)
    for ti, thr in enumerate(iou_thrs):
        for d in range(D):
            best = min(thr, 1 - 1e-10)
            bg = -1
            for g in range(G):
                if gtm[ti, g] and not gt_crowd[g]:
                    continue
                if bg > -1 and not gt_ig[bg] and gt_ig[g]:
                    break
                if ious[d, g] < best:
                    continue
                best = ious[d, g]
                bg = g
            if bg >= 0:
                dtm[ti, d] = bg + 1
                gtm[ti, bg] = d + 1
                dtig[ti, d] = gt_ig[bg]
    return dtm, dtig


def test_native_builds():
    assert load_coco_match() is not None, 'g++ build failed'


@pytest.mark.parametrize('seed', range(5))
def test_native_matches_python(seed):
    rs = np.random.RandomState(seed)
    D, G = rs.randint(1, 30), rs.randint(1, 15)
    ious = rs.rand(D, G).astype(np.float32)
    gt_ig = rs.rand(G) < 0.3
    gt_crowd = gt_ig & (rs.rand(G) < 0.5)
    got = greedy_match_native(IOU_THRS, ious, gt_ig.astype(np.uint8),
                              gt_crowd.astype(np.uint8))
    assert got is not None
    want = py_greedy(IOU_THRS, ious, gt_ig, gt_crowd)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_native_speed_sanity():
    """Native path should crunch a realistic workload quickly."""
    import time
    rs = np.random.RandomState(0)
    ious = rs.rand(100, 20).astype(np.float32)
    gt_ig = np.zeros(20, np.uint8)
    t0 = time.perf_counter()
    for _ in range(1000):
        greedy_match_native(IOU_THRS, ious, gt_ig, gt_ig)
    dt = time.perf_counter() - t0
    assert dt < 5.0  # 1000 (img,cat) cases well under 5s
