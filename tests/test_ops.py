import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from erd_tpu.ops import (batched_nms_mask, filter_scores_and_topk, integral,
                         masked_mean_std, nms_mask, nms_select,
                         topk_mask_select)
from tests.conftest import rand_boxes


def np_greedy_nms(boxes, scores, thr):
    """Classic O(N^2) numpy greedy NMS returning kept original indices."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-6) > thr:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_numpy(rng):
    for _ in range(5):
        boxes = rand_boxes(rng, 60, w=100, h=100)
        scores = rng.rand(60).astype(np.float32)
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.5))
        want = np.zeros(60, bool)
        want[np_greedy_nms(boxes, scores, 0.5)] = True
        np.testing.assert_array_equal(got, want)


def test_nms_valid_mask(rng):
    boxes = rand_boxes(rng, 30, w=100, h=100)
    scores = rng.rand(30).astype(np.float32)
    valid = rng.rand(30) > 0.4
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                              valid_mask=jnp.asarray(valid)))
    # oracle on the valid subset
    idx = np.where(valid)[0]
    kept = np_greedy_nms(boxes[idx], scores[idx], 0.5)
    want = np.zeros(30, bool)
    want[idx[kept]] = True
    np.testing.assert_array_equal(got, want)


def test_batched_nms_classes_dont_suppress(rng):
    # identical boxes in different classes must both survive
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    keep = np.asarray(batched_nms_mask(jnp.asarray(boxes),
                                       jnp.asarray(scores),
                                       jnp.asarray(idxs), 0.5))
    assert keep.all()


def test_nms_select_shapes(rng):
    boxes = rand_boxes(rng, 50, w=100, h=100)
    scores = rng.rand(50).astype(np.float32)
    labels = rng.randint(0, 3, 50).astype(np.int32)
    b, s, l, m = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(labels), 0.5, max_out=10)
    assert b.shape == (10, 4) and s.shape == (10,) and m.dtype == bool
    s = np.asarray(s)
    assert (np.diff(s[np.asarray(m)]) <= 1e-6).all()  # sorted desc


def test_integral_matches_torch(rng):
    x = rng.randn(12, 68).astype(np.float32)
    got = np.asarray(integral(jnp.asarray(x), reg_max=16))
    tx = torch.as_tensor(x)
    p = F.softmax(tx.reshape(-1, 17), dim=1)
    want = F.linear(p, torch.linspace(0, 16, 17)).reshape(-1, 4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_filter_scores_and_topk(rng):
    scores = rng.rand(100, 5).astype(np.float32)
    thr = 0.7
    s, lab, idx, mask = filter_scores_and_topk(jnp.asarray(scores), thr, 20)
    s, lab, idx, mask = map(np.asarray, (s, lab, idx, mask))
    flat = scores.flatten()
    want = np.sort(flat[flat > thr])[::-1][:20]
    np.testing.assert_allclose(s[mask], want[:mask.sum()], rtol=1e-6)
    # labels/indices consistent
    np.testing.assert_allclose(scores[idx[mask], lab[mask]], s[mask],
                               rtol=1e-6)


def test_topk_mask_select(rng):
    x = rng.rand(200).astype(np.float32)
    thr = float(x.mean() + 2 * x.std())
    idx, mask = topk_mask_select(jnp.asarray(x), 50, thr)
    idx, mask = np.asarray(idx), np.asarray(mask)
    want = set(np.where(x > thr)[0].tolist())
    assert set(idx[mask].tolist()) == want


def test_masked_mean_std_matches_torch(rng):
    x = rng.randn(97).astype(np.float32)
    mask = rng.rand(97) > 0.3
    mean, std = masked_mean_std(jnp.asarray(x), jnp.asarray(mask))
    tx = torch.as_tensor(x[mask])
    np.testing.assert_allclose(float(mean), float(tx.mean()), rtol=1e-5)
    np.testing.assert_allclose(float(std), float(tx.std()), rtol=1e-4)


def test_matrix_nms_decays_duplicates(rng):
    from erd_tpu.ops import matrix_nms
    boxes = np.asarray([[0, 0, 50, 50], [1, 1, 51, 51], [200, 200, 250, 250]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    labels = np.asarray([0, 0, 0], np.int32)
    out = np.asarray(matrix_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(labels)))
    assert out[0] == pytest.approx(0.9, abs=1e-5)   # top box undedecayed
    assert out[1] < 0.3                              # duplicate crushed
    assert out[2] == pytest.approx(0.7, abs=1e-3)   # disjoint box kept


def test_fast_nms_vs_greedy_easy(rng):
    from erd_tpu.ops import fast_nms
    boxes = rand_boxes(rng, 40, w=100, h=100)
    scores = rng.rand(40).astype(np.float32)
    labels = np.zeros(40, np.int32)
    keep_fast = np.asarray(fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.asarray(labels), 0.5))
    keep_greedy = np.zeros(40, bool)
    keep_greedy[np_greedy_nms(boxes, scores, 0.5)] = True
    # fast NMS only ever suppresses MORE than greedy
    assert not (keep_fast & ~keep_greedy).any()
    # the top-scoring box always survives both
    assert keep_fast[scores.argmax()]


def test_corner_pool_directions():
    from erd_tpu.ops import corner_pool
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
    bottom = np.asarray(corner_pool(x, 'bottom'))[0, :, :, 0]
    np.testing.assert_array_equal(bottom[2], [8, 9, 10, 11])
    top = np.asarray(corner_pool(x, 'top'))[0, :, :, 0]
    # every row of 'top' equals the max over itself and rows below
    np.testing.assert_array_equal(top[0], [8, 9, 10, 11])
    left = np.asarray(corner_pool(x, 'left'))[0, :, :, 0]
    np.testing.assert_array_equal(left[:, 0], [3, 7, 11])
    right = np.asarray(corner_pool(x, 'right'))[0, :, :, 0]
    np.testing.assert_array_equal(right[:, 3], [3, 7, 11])


def test_point_sample_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as TF
    from erd_tpu.ops import point_sample
    rs = np.random.RandomState(3)
    feat = rs.randn(7, 9, 4).astype(np.float32)
    pts = rs.uniform(0.05, 0.95, (13, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts)))
    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]
    grid = torch.from_numpy(pts * 2 - 1).view(1, 1, -1, 2)
    want = TF.grid_sample(t_feat, grid, mode='bilinear',
                          padding_mode='zeros', align_corners=False)
    want = want[0, :, 0].T.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_conv2d_zeroes_outside_mask():
    import torch
    import torch.nn.functional as TF
    from erd_tpu.ops import masked_conv2d
    rs = np.random.RandomState(4)
    x = rs.randn(1, 8, 10, 3).astype(np.float32)
    wgt = rs.randn(3, 3, 3, 5).astype(np.float32)
    mask = (rs.rand(1, 8, 10) > 0.5)
    got = np.asarray(masked_conv2d(jnp.asarray(x), jnp.asarray(mask),
                                   jnp.asarray(wgt)))
    ref = TF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(wgt).permute(3, 2, 0, 1),
                    padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref * mask[..., None], rtol=1e-4,
                               atol=1e-4)


def test_nms_match_groups():
    from erd_tpu.ops import nms_match
    boxes = jnp.asarray([
        [0., 0., 10., 10.],    # leader A (score .9)
        [1., 1., 11., 11.],    # overlaps A -> group A
        [50., 50., 60., 60.],  # leader B (score .8)
        [51., 50., 61., 60.],  # overlaps B -> group B
        [200., 200., 210., 210.],  # isolated leader C
    ])
    scores = jnp.asarray([0.9, 0.7, 0.8, 0.6, 0.5])
    keep, leader = nms_match(boxes, scores, 0.5)
    keep = np.asarray(keep)
    leader = np.asarray(leader)
    assert keep.tolist() == [True, False, True, False, True]
    assert leader.tolist() == [0, 0, 2, 2, 4]


def test_carafe_softmax_weights_preserve_constants():
    from erd_tpu.ops.carafe import CARAFEPack
    # constant input must stay constant under any softmax reassembly
    # (interior pixels; border pixels see zero padding)
    x = jnp.ones((1, 6, 6, 8))
    m = CARAFEPack(channels=8, up_factor=2)
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(v, x))
    assert y.shape == (1, 12, 12, 8)
    inner = y[0, 4:-4, 4:-4]
    np.testing.assert_allclose(inner, 1.0, atol=1e-5)


def test_carafe_reassemble_identity_kernel():
    from erd_tpu.ops.carafe import carafe_reassemble
    rs = np.random.RandomState(5)
    x = rs.randn(4, 5, 3).astype(np.float32)
    k_up, up = 5, 2
    # kernel = delta at the center tap -> pure nearest upsample
    kern = np.zeros((8, 10, k_up * k_up), np.float32)
    kern[:, :, (k_up * k_up) // 2] = 1.0
    y = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(kern),
                                     up, k_up))
    want = x.repeat(2, axis=0).repeat(2, axis=1)
    np.testing.assert_allclose(y, want, rtol=1e-5)


def np_soft_nms(boxes, scores, iou_thr=0.3, sigma=0.5, min_score=1e-3,
                method='linear'):
    """Published soft-NMS (Bodla et al. 2017) reference loop, one class:
    repeatedly select the max-score box, decay its neighbours' scores.
    Returns [(orig_idx, decayed_score)] in selection order."""
    boxes = boxes.astype(np.float64)
    cur = scores.astype(np.float64).copy()
    alive = np.ones(len(boxes), bool)
    out = []
    while alive.any():
        i = int(np.argmax(np.where(alive, cur, -np.inf)))
        if cur[i] < min_score:
            break
        out.append((i, cur[i]))
        alive[i] = False
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        iou = inter / np.maximum(a[i] + a - inter, 1e-6)
        if method == 'gaussian':
            w = np.exp(-(iou ** 2) / sigma)
        else:
            w = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        cur = np.where(alive, cur * w, cur)
        alive &= cur >= min_score
    return out


@pytest.mark.parametrize('method', ['linear', 'gaussian'])
def test_soft_nms_matches_numpy_single_class(rng, method):
    from erd_tpu.ops import soft_nms_select
    for _ in range(3):
        boxes = rand_boxes(rng, 40, w=80, h=80)
        scores = rng.uniform(0.05, 1.0, 40).astype(np.float32)
        labels = np.zeros(40, np.int32)
        ob, os_, ol, om = jax.jit(
            lambda b, s, l: soft_nms_select(
                b, s, l, 40, iou_threshold=0.3, sigma=0.5,
                min_score=1e-3, method=method)
        )(boxes, scores, labels)
        ref = np_soft_nms(boxes, scores, method=method)
        got = int(np.asarray(om).sum())
        assert got == len(ref)
        for t, (idx, dec) in enumerate(ref):
            np.testing.assert_allclose(np.asarray(os_)[t], dec, rtol=2e-5)
            np.testing.assert_allclose(np.asarray(ob)[t], boxes[idx],
                                       rtol=1e-6)


def test_soft_nms_class_offset_matches_per_class_oracle(rng):
    """Batched (class-aware) soft-NMS == independent per-class soft-NMS
    merged in descending decayed-score order."""
    from erd_tpu.ops import soft_nms_select
    n = 60
    boxes = rand_boxes(rng, n, w=60, h=60)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    labels = rng.randint(0, 3, n).astype(np.int32)
    ob, os_, ol, om = jax.jit(
        lambda b, s, l: soft_nms_select(b, s, l, n, iou_threshold=0.3,
                                        method='linear')
    )(boxes, scores, labels)
    ref = []
    for c in range(3):
        idx_c = np.where(labels == c)[0]
        for i, dec in np_soft_nms(boxes[idx_c], scores[idx_c]):
            ref.append((dec, idx_c[i]))
    ref.sort(key=lambda t: -t[0])
    assert int(np.asarray(om).sum()) == len(ref)
    for t, (dec, idx) in enumerate(ref):
        np.testing.assert_allclose(np.asarray(os_)[t], dec, rtol=2e-5)
        assert int(np.asarray(ol)[t]) == labels[idx]


def test_soft_nms_no_overlap_keeps_all_scores(rng):
    """Disjoint boxes: soft-NMS must be a pure sort (no decay)."""
    from erd_tpu.ops import soft_nms_select
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                      [40, 0, 50, 10]], np.float32)
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    labels = np.zeros(3, np.int32)
    ob, os_, ol, om = soft_nms_select(boxes, scores, labels, 5,
                                      method='gaussian')
    assert np.asarray(om).tolist() == [True, True, True, False, False]
    np.testing.assert_allclose(np.asarray(os_)[:3], [0.9, 0.7, 0.5])


def test_rcnn_predict_single_soft_nms_path():
    """GFLTestConfig(nms_type='soft_nms') routes the RoI-head post-process
    through soft_nms_select (reference faster-rcnn_r50_fpn_soft-nms config)
    and still emits fixed-shape, mask-padded detections."""
    from erd_tpu.models.heads.bbox_head import rcnn_predict_single
    from erd_tpu.models.heads.gfl_head import GFLTestConfig
    from erd_tpu.task.coder import DeltaXYWHBBoxCoder
    rng = np.random.RandomState(3)
    R, C = 32, 4
    cls_logits = jnp.asarray(rng.randn(R, C + 1).astype(np.float32))
    reg_preds = jnp.asarray(0.1 * rng.randn(R, 4 * C).astype(np.float32))
    rois = jnp.asarray(rand_boxes(rng, R, w=100, h=100))
    roi_mask = jnp.ones(R, bool)
    coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
    img_shape = jnp.asarray([100.0, 100.0])
    sf = jnp.asarray([1.0, 1.0])
    hard = GFLTestConfig(score_thr=0.01, max_per_img=20)
    soft = GFLTestConfig(score_thr=0.01, max_per_img=20,
                         nms_type='soft_nms', iou_threshold=0.5)
    run = lambda cfg: jax.jit(
        lambda: rcnn_predict_single(cls_logits, reg_preds, rois, roi_mask,
                                    img_shape, sf, C, coder, cfg))()
    hb, hs, hl, hm = run(hard)
    sb, ss, sl, sm = run(soft)
    assert hb.shape == sb.shape == (20, 4)
    # soft-NMS keeps decayed duplicates that hard NMS kills outright
    assert int(np.asarray(sm).sum()) >= int(np.asarray(hm).sum())
    # both outputs are score-sorted with zeroed padding
    for s_, m_ in ((np.asarray(hs), np.asarray(hm)),
                   (np.asarray(ss), np.asarray(sm))):
        kept = s_[m_]
        assert (np.diff(kept) <= 1e-6).all()
        assert (s_[~m_] == 0).all()
