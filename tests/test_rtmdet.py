"""RTMDet tests: CSPNeXt shapes, shared-head parameter sharing, dynamic
soft-label assignment, detector modes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models.detectors.rtmdet import (CSPNeXt, RTMDetDetector,
                                             dynamic_soft_label_assign)
from tests.test_models import make_batch


def test_cspnext_shapes():
    net = CSPNeXt()
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(net.apply)(vars_, x)
    assert [o.shape[-1] for o in outs] == [128, 256, 512]
    assert [o.shape[1] for o in outs] == [32, 16, 8]


def test_dynamic_soft_label_assign(rng):
    from tests.conftest import rand_boxes
    n = 120
    pts = rand_boxes(rng, n, w=200, h=200)[:, :2]
    strides = np.full(n, 8.0, np.float32)
    gts = np.asarray([[20, 20, 100, 100]], np.float32)
    decoded = np.tile(pts, (1, 2)).astype(np.float32)
    decoded[:, :2] -= 15
    decoded[:, 2:] += 15
    probs = np.full((120, 3), 0.4, np.float32)
    pos, gt_idx, ious = jax.jit(dynamic_soft_label_assign)(
        jnp.asarray(pts), jnp.asarray(strides), jnp.asarray(decoded),
        jnp.asarray(probs), jnp.asarray(gts),
        jnp.asarray([1], np.int32), jnp.asarray([True]))
    pos = np.asarray(pos)
    assert 0 < pos.sum() <= 13
    for i in np.where(pos)[0]:
        assert 20 < pts[i, 0] < 100 and 20 < pts[i, 1] < 100


@pytest.fixture(scope='module')
def rtmdet():
    det = RTMDetDetector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_rtmdet_shared_head_params(rtmdet):
    det, variables = rtmdet
    head = variables['params']['bbox_head']
    # conv kernels shared across levels: one cls_conv_0, but per-level BN
    assert 'cls_conv_0' in head and 'cls_conv_1' in head
    assert 'cls_bn_0_0' in head and 'cls_bn_2_0' in head


def test_rtmdet_loss(rtmdet):
    det, variables = rtmdet
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [2])]
    losses, consts = det.loss_and_state_jit(variables,
                                            make_batch(gts=gts))
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_rtmdet_grads(rtmdet):
    det, variables = rtmdet
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        losses, _ = det.loss_and_state({'params': p, **consts}, batch)
        return sum(losses.values())

    grads = jax.grad(total)(params)
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0


def test_rtmdet_predict(rtmdet):
    det, variables = rtmdet
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
