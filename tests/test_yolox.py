"""YOLOX family tests: CSPDarknet shapes, decode, SimOTA integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models.detectors.yolox import (YOLOXContext, YOLOXDetector,
                                            yolox_decode)
from tests.test_models import make_batch


def test_csp_darknet_shapes():
    from erd_tpu.models.backbones.csp_darknet import CSPDarknet
    net = CSPDarknet()
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(net.apply)(vars_, x)
    # yolox-s widths: 128/256/512 at strides 8/16/32
    assert [o.shape[-1] for o in outs] == [128, 256, 512]
    assert [o.shape[1] for o in outs] == [32, 16, 8]


def test_yolox_decode():
    ctx = YOLOXContext.build((64, 96))
    n = ctx.points.shape[0]
    raw = jnp.zeros((1, n, 85))
    boxes, obj, cls = yolox_decode(ctx, raw)
    b = np.asarray(boxes[0])
    ctr = (b[:, :2] + b[:, 2:]) / 2
    np.testing.assert_allclose(ctr, ctx.points, rtol=1e-5)
    wh = b[:, 2:] - b[:, :2]
    np.testing.assert_allclose(wh, np.stack([ctx.strides] * 2, -1),
                               rtol=1e-5)


@pytest.fixture(scope='module')
def yolox():
    det = YOLOXDetector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_yolox_loss(yolox):
    det, variables = yolox
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [2])]
    losses, consts = det.loss_and_state_jit(variables, make_batch(gts=gts))
    assert set(losses) == {'loss_cls', 'loss_obj', 'loss_bbox'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # BN stats updated
    old = jax.tree.leaves(variables['batch_stats'])[0]
    new = jax.tree.leaves(consts['batch_stats'])[0]
    assert float(jnp.abs(old - new).sum()) > 0


def test_yolox_grads(yolox):
    det, variables = yolox
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


def test_yolox_predict(yolox):
    det, variables = yolox
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool
