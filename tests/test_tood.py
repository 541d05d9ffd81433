"""TOOD: T-head mechanics + TAL loss invariants + initial-phase switch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models import make_batch


@pytest.fixture(scope='module')
def tood():
    from erd_tpu.models.detectors.tood import TOODDetector
    det = TOODDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_bilinear_refine_identity_and_shift():
    from erd_tpu.models.heads.tood_head import _bilinear_refine
    rs = np.random.RandomState(0)
    m = jnp.asarray(rs.rand(6, 8, 4).astype(np.float32))
    # zero offsets: identity
    out = _bilinear_refine(m, jnp.zeros((6, 8, 8)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(m), atol=1e-6)
    # integer shift by (0, +1) in x on channel 0 only
    off = np.zeros((6, 8, 8), np.float32)
    off[..., 1] = 1.0  # dx for channel 0
    out = np.asarray(_bilinear_refine(m, jnp.asarray(off)))
    np.testing.assert_allclose(out[:, :-1, 0], np.asarray(m)[:, 1:, 0],
                               atol=1e-6)
    # zero-padding outside the map
    np.testing.assert_allclose(out[:, -1, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1:], np.asarray(m)[..., 1:],
                               atol=1e-6)


def test_forward_shapes_and_activated_scores(tood):
    det, variables = tood
    imgs = jnp.zeros((1, 64, 96, 3), jnp.uint8)
    cls_lvl, box_lvl = det.forward_jit(variables, imgs)
    assert len(cls_lvl) == 5
    assert cls_lvl[0].shape == (1, 8, 12, 4)
    assert box_lvl[0].shape == (1, 8, 12, 4)
    s = np.asarray(cls_lvl[0])
    assert (s >= 0).all() and (s <= 1).all()  # activated scores
    bx = np.asarray(box_lvl[0]).reshape(-1, 4)
    assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()


def test_loss_modes(tood):
    det, variables = tood
    # empty gt
    losses = det.loss_jit(variables, make_batch())
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_cls']) > 0
    # with gt: both engaged, finite (TAL mode)
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0
    # initial (ATSS + focal) phase
    losses_i = det.loss_initial_jit(variables, make_batch(gts=gts))
    for k, v in losses_i.items():
        assert np.isfinite(float(v)), k
    assert float(losses_i['loss_cls']) > 0
    assert float(losses_i['loss_bbox']) > 0


def test_grads_flow(tood):
    det, variables = tood
    gts = [([[10, 10, 60, 50]], [1]), ([], [])]
    batch = make_batch(gts=gts)
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p, **consts}, batch).values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_predict_contract(tood):
    det, variables = tood
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool
