"""Equivalence pins for the round-4 final-snapshot perf rewrites.

Two rewrites landed claiming semantic equivalence with no dedicated test:

  1. ``StemConv(s2d=True)`` (models/backbones/resnet.py) — the 7x7/2 stem
     conv as a 4x4/1 conv over a 2x2 space-to-depth input. Claim:
     tap-for-tap identical products, only summation order changes
     (float-reassociation-level drift).
  2. ``_suppress_matrix``-based ``nms_mask`` (ops/nms.py) — the coordinate-
     vector IoU fusion replacing the generic ``bbox_overlaps`` route that
     materialized f32[16,4481,4481,2]. Claim: bit-identical keep masks,
     including with bf16 storage of the 0/1 suppress matrix.

These tests make each claim a CI invariant so a future "optimization" that
changes semantics fails loudly. Reference semantics being pinned:
torch's Conv2d(3, 64, 7, stride=2, padding=3) stem
(reference mmdet/models/backbones/resnet.py:630-650) and mmcv greedy NMS
(reference mmdet/models/dense_heads/base_dense_head.py:479).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import rand_boxes


# ---------------------------------------------------------------------------
# 1. StemConv space-to-depth lowering
# ---------------------------------------------------------------------------

def _stem_outputs(x, seed=0):
    """Apply the SAME (7,7,C,F) kernel via both stem paths."""
    from erd_tpu.models.backbones.resnet import StemConv
    plain = StemConv(16, s2d=False)
    variables = plain.init(jax.random.PRNGKey(seed), x)
    y_plain = jax.jit(plain.apply)(variables, x)
    y_s2d = jax.jit(StemConv(16, s2d=True).apply)(variables, x)
    return variables, y_plain, y_s2d


def test_stem_s2d_matches_plain_conv_fp32():
    """Even H/W: s2d path == plain 7x7/2 conv to reassociation tolerance."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 64, 96, 3).astype(np.float32))
    _, y_plain, y_s2d = _stem_outputs(x)
    assert y_plain.shape == y_s2d.shape == (2, 32, 48, 16)
    # identical products, different summation order: drift must stay at
    # float32 reassociation level (advisor-measured ~4e-6; pin 1e-4 vs
    # an output scale of O(1))
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               rtol=0, atol=1e-4)
    scale = float(jnp.abs(y_plain).mean())
    assert scale > 0.1  # tolerance above is meaningful vs this scale


def test_stem_s2d_odd_hw_falls_back_to_plain():
    """Odd H or W takes the plain-conv branch: bit-exact equality."""
    from erd_tpu.models.backbones.resnet import StemConv
    rs = np.random.RandomState(1)
    for shape in [(1, 63, 96, 3), (1, 64, 95, 3), (1, 63, 95, 3)]:
        x = jnp.asarray(rs.randn(*shape).astype(np.float32))
        plain = StemConv(8, s2d=False)
        variables = plain.init(jax.random.PRNGKey(0), x)
        y_plain = jax.jit(plain.apply)(variables, x)
        y_s2d = jax.jit(StemConv(8, s2d=True).apply)(variables, x)
        np.testing.assert_array_equal(np.asarray(y_s2d), np.asarray(y_plain))


def test_stem_s2d_vs_torch_oracle():
    """Both paths reproduce torch Conv2d(C, F, 7, stride=2, padding=3)."""
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(2)
    x = rs.randn(1, 32, 48, 3).astype(np.float32)
    variables, y_plain, y_s2d = _stem_outputs(jnp.asarray(x))
    kernel = np.asarray(variables['params']['kernel'])  # (7,7,C,F)

    with torch.no_grad():
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(kernel.transpose(3, 2, 0, 1)),
            stride=2, padding=3)
    t = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y_plain), t, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_s2d), t, rtol=0, atol=1e-4)


def test_stem_s2d_keeps_torch_importable_kernel_layout():
    """The param is (7,7,C,F) regardless of s2d, so checkpoint import
    (tools/weight_import) never needs to know which lowering runs."""
    from erd_tpu.models.backbones.resnet import StemConv
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    for s2d in (False, True):
        v = StemConv(64, s2d=s2d).init(jax.random.PRNGKey(0), x)
        assert v['params']['kernel'].shape == (7, 7, 3, 64)


# ---------------------------------------------------------------------------
# 2. _suppress_matrix NMS rewrite
# ---------------------------------------------------------------------------

def _greedy_nms_oracle(boxes, scores, thr):
    """Line-faithful greedy NMS in f64-free numpy f32, same eps as
    bbox_overlaps(mode='iou', eps=1e-6)."""
    order = np.argsort(-scores, kind='stable')
    keep = np.zeros(len(boxes), bool)
    alive = []
    for i in order:
        b = boxes[i]
        ok = True
        for j in alive:
            a = boxes[j]
            iw = max(min(b[2], a[2]) - max(b[0], a[0]), 0.0)
            ih = max(min(b[3], a[3]) - max(b[1], a[1]), 0.0)
            ov = np.float32(iw) * np.float32(ih)
            area_b = np.float32(max(b[2] - b[0], 0)) * np.float32(
                max(b[3] - b[1], 0))
            area_a = np.float32(max(a[2] - a[0], 0)) * np.float32(
                max(a[3] - a[1], 0))
            union = np.float32(max(area_b + area_a - ov, 1e-6))
            if np.float32(ov / union) > thr:
                ok = False
                break
        if ok:
            alive.append(i)
            keep[i] = True
    return keep


def _adversarial_boxes():
    """Boxes whose pairwise IoUs straddle the 0.5 threshold by tiny
    margins, plus random clusters — the worst case for any arithmetic
    deviation in the suppress-matrix route."""
    rs = np.random.RandomState(3)
    boxes = [np.array([10.0, 10.0, 110.0, 110.0], np.float32)]
    base = boxes[0]
    # shifted copies: IoU = (100-d)/(100+d) crosses 0.5 at d = 100/3
    for d in [33.0, 33.2, 33.3, 33.33, 33.34, 33.4, 33.5, 34.0]:
        boxes.append(base + np.array([d, 0, d, 0], np.float32))
        boxes.append(base + np.array([0, d, 0, d], np.float32))
    cluster = rand_boxes(rs, 40, w=160, h=160)
    boxes = np.concatenate([np.stack(boxes), cluster]).astype(np.float32)
    scores = rs.uniform(0.1, 1.0, len(boxes)).astype(np.float32)
    return boxes, scores


def test_nms_mask_matches_python_greedy_oracle():
    from erd_tpu.ops.nms import nms_mask
    boxes, scores = _adversarial_boxes()
    got = np.asarray(jax.jit(nms_mask, static_argnums=2)(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    want = _greedy_nms_oracle(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_suppress_matrix_route_matches_bbox_overlaps_route():
    """The fused coordinate-vector suppress matrix (bf16-stored) must give
    keep masks identical to a direct bbox_overlaps-based reconstruction
    with an f32 matrix."""
    from erd_tpu.ops.nms import _greedy_fixpoint, _suppress_matrix
    from erd_tpu.structures.boxes import bbox_overlaps

    boxes, scores = _adversarial_boxes()
    thr = 0.5
    order = np.argsort(-scores, kind='stable')
    sboxes = jnp.asarray(boxes[order])
    svalid = jnp.ones(len(boxes), bool)
    n = len(boxes)

    sup_fused = _suppress_matrix(sboxes, svalid, thr)
    iou = bbox_overlaps(sboxes, sboxes, mode='iou')
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    sup_direct = ((iou > thr) & later).astype(jnp.float32)

    # the 0/1 matrices themselves must agree entry-for-entry...
    np.testing.assert_array_equal(
        np.asarray(sup_fused, np.float32), np.asarray(sup_direct))
    # ...and both fixpoint evaluations produce the same alive set
    alive_fused = np.asarray(_greedy_fixpoint(sup_fused, svalid, n))
    alive_direct = np.asarray(
        _greedy_fixpoint(sup_direct.astype(jnp.bfloat16), svalid, n))
    np.testing.assert_array_equal(alive_fused, alive_direct)


def test_nms_mask_valid_mask_and_ties():
    """Invalid entries never kept / never suppress; equal scores keep the
    stable (original-index) order like torch sort(stable=True)."""
    from erd_tpu.ops.nms import nms_mask
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                      [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.9, 0.8, 0.9], np.float32)
    valid = np.array([True, True, True, False])
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                              valid_mask=jnp.asarray(valid)))
    # box 0 wins the tie (stable), suppresses 1 and (identical) 3; 3 is
    # also invalid; 2 is disjoint
    np.testing.assert_array_equal(got, [True, False, True, False])
