import numpy as np
import jax.numpy as jnp

from erd_tpu.structures import (bbox2distance, bbox_overlaps, distance2bbox,
                                xyxy_to_xywh)
from tests.conftest import rand_boxes


def np_iou(b1, b2, mode='iou', eps=1e-6):
    """Independent O(mn) loop oracle."""
    m, n = len(b1), len(b2)
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            xx1 = max(b1[i, 0], b2[j, 0])
            yy1 = max(b1[i, 1], b2[j, 1])
            xx2 = min(b1[i, 2], b2[j, 2])
            yy2 = min(b1[i, 3], b2[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            union = a1 if mode == 'iof' else a1 + a2 - inter
            iou = inter / max(union, eps)
            if mode == 'giou':
                ex1 = min(b1[i, 0], b2[j, 0])
                ey1 = min(b1[i, 1], b2[j, 1])
                ex2 = max(b1[i, 2], b2[j, 2])
                ey2 = max(b1[i, 3], b2[j, 3])
                enc = max((ex2 - ex1) * (ey2 - ey1), eps)
                iou = iou - (enc - max(union, eps)) / enc
            out[i, j] = iou
    return out


def test_bbox_overlaps_modes(rng):
    b1 = rand_boxes(rng, 13)
    b2 = rand_boxes(rng, 7)
    for mode in ('iou', 'iof', 'giou'):
        got = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                       mode=mode))
        want = np_iou(b1, b2, mode)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bbox_overlaps_aligned(rng):
    b1 = rand_boxes(rng, 9)
    b2 = rand_boxes(rng, 9)
    got = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2),
                                   is_aligned=True))
    want = np.diag(np_iou(b1, b2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_distance_roundtrip(rng):
    boxes = rand_boxes(rng, 20)
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    d = bbox2distance(jnp.asarray(centers), jnp.asarray(boxes))
    back = distance2bbox(jnp.asarray(centers), d)
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-5, atol=1e-4)


def test_bbox2distance_clamp(rng):
    boxes = rand_boxes(rng, 20)
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    d = np.asarray(bbox2distance(jnp.asarray(centers), jnp.asarray(boxes),
                                 max_dis=16, eps=0.1))
    assert d.max() <= 16 - 0.1 + 1e-6
    assert d.min() >= 0


def test_distance2bbox_clip():
    pts = jnp.asarray([[10.0, 10.0]])
    dist = jnp.asarray([[100.0, 100.0, 100.0, 100.0]])
    out = np.asarray(distance2bbox(pts, dist, max_shape=(50, 60)))
    np.testing.assert_allclose(out, [[0, 0, 60, 50]])


def test_xyxy_to_xywh():
    out = np.asarray(xyxy_to_xywh(jnp.asarray([[5.0, 6.0, 15.0, 26.0]])))
    np.testing.assert_allclose(out, [[5, 6, 10, 20]])
