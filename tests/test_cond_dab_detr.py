"""Conditional DETR + DAB-DETR: loss/predict smoke + anchor refinement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.structures import GTInstances, ImageMeta


def make_batch(b=2, h=64, w=96, max_gt=6):
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, h, w, 3), dtype=np.uint8)
    gts, metas = [], []
    for i in range(b):
        boxes = np.asarray([[10.0, 10.0, 60.0, 50.0],
                            [30.0, 20.0, 80.0, 60.0]], np.float32)
        gts.append(GTInstances.pad(boxes, np.asarray([i % 3, 1], np.int32),
                                   max_gt))
        metas.append(ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=i))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs), *gts)
    meta = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
    return dict(images=jnp.asarray(images), gt=gt, meta=meta)


@pytest.fixture(scope='module', params=['cond', 'dab'])
def det_and_vars(request):
    from erd_tpu.models.detectors.conditional_dab_detr import (
        ConditionalDETRDetector, DABDETRDetector)
    cls = DABDETRDetector if request.param == 'dab' else \
        ConditionalDETRDetector
    det = cls(num_classes=4, depth=18, num_queries=16)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_loss_finite_and_aux_layers(det_and_vars):
    det, variables = det_and_vars
    losses = det.loss_jit(variables, make_batch())
    assert 'loss_cls' in losses and 'loss_cls_aux0' in losses
    assert len([k for k in losses if k.startswith('loss_cls')]) == 6
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_cls']) > 0


def test_predict_shapes(det_and_vars):
    det, variables = det_and_vars
    res = det.predict_jit(variables, make_batch())
    k = min(det.max_per_img, det.num_queries * det.num_classes)
    assert res.bboxes.shape == (2, k, 4)
    b = np.asarray(res.bboxes)
    assert np.isfinite(b).all()
    assert (b[..., 2:] >= b[..., :2] - 1e-3).all()


def test_grads_reach_query_machinery(det_and_vars):
    det, variables = det_and_vars
    batch = make_batch()
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}
    grads = jax.jit(jax.grad(lambda p: sum(jax.tree.leaves(
        det.loss({'params': p, **consts}, batch)))))(params)
    key = 'anchor_embed' if det.dab else 'query_embed'
    gsum = sum(float(jnp.abs(x).sum())
               for x in jax.tree.leaves(grads[key]))
    assert gsum > 0, key
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(
        grads['decoder_0']['cross_attn']))
    assert gsum > 0
