"""Detector smoke tests on tiny shapes (the reference's demo_mm_inputs
pattern, SURVEY.md section 4): empty-gt => cls>0, box/dfl==0; one-gt => all >0."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models import GFLDetector
from erd_tpu.structures import GTInstances, ImageMeta


@pytest.fixture(scope='module')
def small_det():
    return GFLDetector(num_classes=4, depth=18)


@pytest.fixture(scope='module')
def small_vars(small_det):
    return small_det.init(jax.random.PRNGKey(0), image_shape=(64, 96))


def make_batch(b=2, h=64, w=96, gts=None, max_gt=8):
    images = np.random.RandomState(0).randint(0, 255, (b, h, w, 3),
                                              dtype=np.uint8)
    gt_list = []
    for i in range(b):
        g = gts[i] if gts else ([], [])
        gt_list.append(GTInstances.pad(np.asarray(g[0], np.float32).reshape(
            -1, 4), g[1], max_gt))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs), *gt_list)
    metas = [ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=i)
             for i in range(b)]
    meta = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
    return dict(images=jnp.asarray(images), gt=gt, meta=meta)


def test_forward_shapes(small_det, small_vars):
    batch = make_batch()
    cls, reg = small_det.forward_jit(small_vars, batch['images'])
    assert len(cls) == 5 and len(reg) == 5
    assert cls[0].shape == (2, 8, 12, 4)
    assert reg[0].shape == (2, 8, 12, 68)
    assert cls[4].shape == (2, 1, 1, 4)  # 64/128 -> ceil = 1


def test_loss_empty_gt(small_det, small_vars):
    batch = make_batch()
    losses = small_det.loss_jit(small_vars, batch)
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_dfl']) == 0


def test_loss_with_gt(small_det, small_vars):
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40], [30, 10, 80, 60]],
                                       [0, 2])]
    batch = make_batch(gts=gts)
    losses = small_det.loss_jit(small_vars, batch)
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0
    assert float(losses['loss_dfl']) > 0
    for v in losses.values():
        assert np.isfinite(float(v))


def test_loss_is_jittable(small_det, small_vars):
    gts = [([[10, 10, 60, 50]], [1]), ([], [])]
    batch = make_batch(gts=gts)

    @jax.jit
    def total_loss(v, b):
        return sum(small_det.loss_jit(v, b).values())

    v1 = float(total_loss(small_vars, batch))
    v2 = float(sum(small_det.loss_jit(small_vars, batch).values()))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


def test_grad_flows(small_det, small_vars):
    gts = [([[10, 10, 60, 50]], [1]), ([], [])]
    batch = make_batch(gts=gts)
    params = small_vars['params']
    consts = {k: v for k, v in small_vars.items() if k != 'params'}

    def total(p):
        losses = small_det.loss_jit({'params': p, **consts}, batch)
        return sum(losses.values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_predict_shapes(small_det, small_vars):
    batch = make_batch()
    res = small_det.predict_jit(small_vars, batch)
    assert res.bboxes.shape == (2, 100, 4)
    assert res.scores.shape == (2, 100)
    assert res.labels.shape == (2, 100)
    assert res.mask.dtype == bool
    # fresh-initialized head has ~0.01 prior => everything below 0.05 thr
    s = np.asarray(res.scores)
    assert (s[~np.asarray(res.mask)] == 0).all()


def test_predict_rescale(small_det, small_vars):
    batch = make_batch()
    meta = batch['meta']
    meta = meta.replace(scale_factor=jnp.full_like(meta.scale_factor, 2.0))
    batch['meta'] = meta
    r1 = small_det.predict_jit(small_vars, batch, rescale=False)
    r2 = small_det.predict_jit(small_vars, batch, rescale=True)
    m = np.asarray(r1.mask)
    if m.any():
        np.testing.assert_allclose(np.asarray(r2.bboxes)[m],
                                   np.asarray(r1.bboxes)[m] / 2.0,
                                   rtol=1e-5)
