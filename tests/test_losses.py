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
