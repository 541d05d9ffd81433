"""Loss parity tests against torch oracles implementing the reference math
(cited formulas from /root/reference/mmdet/models/losses/)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from erd_tpu.losses import (distribution_focal_loss, giou_loss,
                            knowledge_distillation_kl_div_loss,
                            l2_response_loss, quality_focal_loss,
                            sigmoid_focal_loss, weight_reduce_loss)
from tests.conftest import rand_boxes


def torch_qfl(pred, label, score, beta=2.0):
    pred = torch.as_tensor(pred)
    label = torch.as_tensor(label)
    score = torch.as_tensor(score)
    pred_sigmoid = pred.sigmoid()
    scale_factor = pred_sigmoid
    zerolabel = torch.zeros_like(pred)
    loss = F.binary_cross_entropy_with_logits(
        pred, zerolabel, reduction='none') * scale_factor.pow(beta)
    bg = pred.size(1)
    pos = ((label >= 0) & (label < bg)).nonzero().squeeze(1)
    pos_label = label[pos].long()
    scale_factor = score[pos] - pred_sigmoid[pos, pos_label]
    loss[pos, pos_label] = F.binary_cross_entropy_with_logits(
        pred[pos, pos_label], score[pos],
        reduction='none') * scale_factor.abs().pow(beta)
    return loss.sum(dim=1).numpy()


def test_qfl_matches_reference(rng):
    n, c = 64, 12
    pred = rng.randn(n, c).astype(np.float32) * 2
    label = rng.randint(0, c + 1, n).astype(np.int32)  # c == background
    score = (rng.rand(n) * (label < c)).astype(np.float32)
    got = quality_focal_loss(jnp.asarray(pred), (jnp.asarray(label),
                                                 jnp.asarray(score)),
                             reduction='none')
    want = torch_qfl(pred, label, score)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_qfl_avg_factor(rng):
    n, c = 16, 4
    pred = rng.randn(n, c).astype(np.float32)
    label = rng.randint(0, c + 1, n).astype(np.int32)
    score = (rng.rand(n) * (label < c)).astype(np.float32)
    weight = rng.rand(n).astype(np.float32)
    got = quality_focal_loss(jnp.asarray(pred),
                             (jnp.asarray(label), jnp.asarray(score)),
                             weight=jnp.asarray(weight), avg_factor=7.0)
    want = (torch_qfl(pred, label, score) * weight).sum() / (
        7.0 + np.finfo(np.float32).eps)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dfl_matches_reference(rng):
    n, bins = 40, 17
    pred = rng.randn(n, bins).astype(np.float32)
    label = (rng.rand(n) * (bins - 1 - 0.1)).astype(np.float32)
    got = distribution_focal_loss(jnp.asarray(pred), jnp.asarray(label),
                                  reduction='none')
    tp = torch.as_tensor(pred)
    tl = torch.as_tensor(label)
    dl = tl.long()
    dr = dl + 1
    wl = dr.float() - tl
    wr = tl - dl.float()
    want = (F.cross_entropy(tp, dl, reduction='none') * wl +
            F.cross_entropy(tp, dr, reduction='none') * wr).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_kd_kl_matches_reference(rng):
    n, bins = 30, 17
    pred = rng.randn(n, bins).astype(np.float32) * 3
    soft = rng.randn(n, bins).astype(np.float32) * 3
    T = 10
    got = knowledge_distillation_kl_div_loss(
        jnp.asarray(pred), jnp.asarray(soft), T=T, reduction='none')
    tp, ts = torch.as_tensor(pred), torch.as_tensor(soft)
    target = F.softmax(ts / T, dim=1)
    want = (F.kl_div(F.log_softmax(tp / T, dim=1), target,
                     reduction='none').mean(1) * T * T).numpy()
    # T^2 = 100 amplifies fp32 rounding noise; 5e-3 relative is parity here.
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=1e-5)


def test_giou_loss_range(rng):
    b1 = rand_boxes(rng, 25)
    b2 = rand_boxes(rng, 25)
    loss = np.asarray(giou_loss(jnp.asarray(b1), jnp.asarray(b2),
                                reduction='none'))
    assert (loss >= 0).all() and (loss <= 2).all()
    same = np.asarray(giou_loss(jnp.asarray(b1), jnp.asarray(b1),
                                reduction='none'))
    np.testing.assert_allclose(same, 0, atol=1e-5)


def test_giou_loss_vs_torchvision_formula(rng):
    b1 = rand_boxes(rng, 10)
    b2 = rand_boxes(rng, 10)
    got = np.asarray(giou_loss(jnp.asarray(b1), jnp.asarray(b2),
                               reduction='none'))
    # manual giou
    xx1 = np.maximum(b1[:, 0], b2[:, 0])
    yy1 = np.maximum(b1[:, 1], b2[:, 1])
    xx2 = np.minimum(b1[:, 2], b2[:, 2])
    yy2 = np.minimum(b1[:, 3], b2[:, 3])
    inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1 + a2 - inter
    ex1 = np.minimum(b1[:, 0], b2[:, 0])
    ey1 = np.minimum(b1[:, 1], b2[:, 1])
    ex2 = np.maximum(b1[:, 2], b2[:, 2])
    ey2 = np.maximum(b1[:, 3], b2[:, 3])
    enc = (ex2 - ex1) * (ey2 - ey1)
    giou = inter / union - (enc - union) / enc
    np.testing.assert_allclose(got, 1 - giou, rtol=1e-4, atol=1e-5)


def test_l2_response_loss_masked(rng):
    pred = rng.randn(10, 5).astype(np.float32)
    target = rng.randn(10, 5).astype(np.float32)
    mask = np.zeros(10, bool)
    mask[:4] = True
    got = float(l2_response_loss(jnp.asarray(pred), jnp.asarray(target),
                                 mask=jnp.asarray(mask)[:, None]))
    want = np.mean((pred[:4] - target[:4])**2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_matches_torch(rng):
    n, c = 32, 6
    pred = rng.randn(n, c).astype(np.float32)
    label = rng.randint(0, c + 1, n).astype(np.int32)
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(label),
                                        reduction='none'))
    tp = torch.as_tensor(pred)
    onehot = F.one_hot(torch.as_tensor(label).long(), c + 1)[:, :c].float()
    p = tp.sigmoid()
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (0.25 * onehot + 0.75 * (1 - onehot)) * pt.pow(2.0)
    want = (F.binary_cross_entropy_with_logits(tp, onehot, reduction='none') *
            fw).sum(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weight_reduce_protocol():
    loss = jnp.asarray([1.0, 2.0, 3.0])
    w = jnp.asarray([1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        float(weight_reduce_loss(loss, w, 'mean', None)), (1 + 0 + 3) / 3,
        rtol=1e-6)
    np.testing.assert_allclose(
        float(weight_reduce_loss(loss, w, 'mean', 2.0)), 2.0, rtol=1e-5)


def _rand_boxes(rng, n, lo=0, hi=100):
    x1 = rng.uniform(lo, hi - 10, n)
    y1 = rng.uniform(lo, hi - 10, n)
    w = rng.uniform(2, 30, n)
    h = rng.uniform(2, 30, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def test_bounded_iou_matches_torch(rng):
    from erd_tpu.losses import bounded_iou_loss
    pred = _rand_boxes(rng, 16)
    target = _rand_boxes(rng, 16)
    got = np.asarray(bounded_iou_loss(jnp.asarray(pred),
                                      jnp.asarray(target),
                                      reduction='none'))
    tp, tt = torch.as_tensor(pred), torch.as_tensor(target)
    pcx = (tp[:, 0] + tp[:, 2]) * 0.5
    pcy = (tp[:, 1] + tp[:, 3]) * 0.5
    pw = tp[:, 2] - tp[:, 0]
    ph = tp[:, 3] - tp[:, 1]
    tcx = (tt[:, 0] + tt[:, 2]) * 0.5
    tcy = (tt[:, 1] + tt[:, 3]) * 0.5
    tw = tt[:, 2] - tt[:, 0]
    th = tt[:, 3] - tt[:, 1]
    dx, dy = tcx - pcx, tcy - pcy
    eps = 1e-3
    ldx = 1 - torch.clamp((tw - 2 * dx.abs()) / (tw + 2 * dx.abs() + eps),
                          min=0)
    ldy = 1 - torch.clamp((th - 2 * dy.abs()) / (th + 2 * dy.abs() + eps),
                          min=0)
    ldw = 1 - torch.min(tw / (pw + eps), pw / (tw + eps))
    ldh = 1 - torch.min(th / (ph + eps), ph / (th + eps))
    comb = torch.stack([ldx, ldy, ldw, ldh], -1)
    beta = 0.2
    want = torch.where(comb < beta, 0.5 * comb * comb / beta,
                       comb - 0.5 * beta).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eiou_matches_torch_formula(rng):
    from erd_tpu.losses import eiou_loss
    pred = _rand_boxes(rng, 16)
    target = _rand_boxes(rng, 16)
    got = np.asarray(eiou_loss(jnp.asarray(pred), jnp.asarray(target),
                               reduction='none'))
    tp, tt = torch.as_tensor(pred), torch.as_tensor(target)
    px1, py1, px2, py2 = tp[:, 0], tp[:, 1], tp[:, 2], tp[:, 3]
    tx1, ty1, tx2, ty2 = tt[:, 0], tt[:, 1], tt[:, 2], tt[:, 3]
    ex1, ey1 = torch.min(px1, tx1), torch.min(py1, ty1)
    ix1, iy1 = torch.max(px1, tx1), torch.max(py1, ty1)
    ix2, iy2 = torch.min(px2, tx2), torch.min(py2, ty2)
    xmin, ymin = torch.min(ix1, ix2), torch.min(iy1, iy2)
    xmax, ymax = torch.max(ix1, ix2), torch.max(iy1, iy2)
    inter = (ix2 - ex1) * (iy2 - ey1) + (xmin - ex1) * (ymin - ey1) - \
        (ix1 - ex1) * (ymax - ey1) - (xmax - ex1) * (iy1 - ey1)
    union = (px2 - px1) * (py2 - py1) + (tx2 - tx1) * (ty2 - ty1) - \
        inter + 1e-7
    ious = 1 - inter / union
    sp = 0.1
    sign = (ious < sp).float()
    want = (0.5 * sign * ious * ious / sp +
            (1 - sign) * (ious - 0.5 * sp)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_associative_embedding_invariants():
    from erd_tpu.losses import associative_embedding_loss
    # identical embeddings per object -> zero pull; far apart means -> no
    # push below margin
    tl = jnp.asarray([0.0, 5.0, 0.0])
    br = jnp.asarray([0.0, 5.0, 0.0])
    m = jnp.asarray([True, True, False])
    pull, push = associative_embedding_loss(tl, br, m, 1.0, 1.0)
    assert float(pull) == 0.0
    assert float(push) == 0.0  # |0-5| = 5 > margin 1
    # same mean embeddings -> push = margin per off-diag pair
    tl2 = jnp.asarray([1.0, 1.0])
    br2 = jnp.asarray([1.0, 1.0])
    m2 = jnp.asarray([True, True])
    pull2, push2 = associative_embedding_loss(tl2, br2, m2, 1.0, 1.0)
    assert float(pull2) == 0.0
    np.testing.assert_allclose(float(push2), 1.0, rtol=1e-6)
    # padded slots do not contribute
    tl3 = jnp.asarray([1.0, 99.0])
    m3 = jnp.asarray([True, False])
    pull3, push3 = associative_embedding_loss(tl3, tl3, m3, 1.0, 1.0)
    assert float(pull3) == 0.0 and float(push3) == 0.0


def test_isr_p_and_carl_protocol():
    from erd_tpu.losses import carl_loss, isr_p_weights
    pos = jnp.asarray([True, True, True, False])
    labels = jnp.asarray([0, 0, 1, 2])
    ious = jnp.asarray([0.9, 0.5, 0.7, 0.0])
    w = np.asarray(isr_p_weights(None, ious, pos, labels, num_classes=3,
                                 k=2.0, bias=0.0))
    # higher-IoU positive of a class outranks the lower one
    assert w[0] > w[1]
    # single-class positive gets full importance
    assert w[2] == max(w)
    # weighted positive count preserved
    np.testing.assert_allclose(w[:3].sum(), 3.0, rtol=1e-5)
    assert w[3] == 1.0  # negatives untouched

    probs = jnp.asarray([0.9, 0.1, 0.5, 0.0])
    reg = jnp.asarray([1.0, 1.0, 1.0, 5.0])
    loss = float(carl_loss(probs, reg, pos, k=1.0, bias=0.2, avg_factor=3))
    # mean of normalized factors is 1 -> loss == mean reg over pos
    np.testing.assert_allclose(loss, 1.0, rtol=1e-5)
