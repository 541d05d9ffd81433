"""Cascade R-CNN: 3-stage IoU-progressive RoI refinement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.structures import GTInstances, ImageMeta


def make_batch(b=2, h=64, w=96, max_gt=8):
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


@pytest.fixture(scope='module')
def cascade():
    from erd_tpu.models.detectors.cascade_rcnn import CascadeRCNNDetector
    det = CascadeRCNNDetector(num_classes=3, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_cascade_loss_all_stages(cascade):
    det, variables = cascade
    losses = det.loss_jit(variables, make_batch())
    expect = {'loss_rpn_cls', 'loss_rpn_bbox'} | {
        f'loss_{k}_s{i}' for k in ('cls', 'bbox') for i in range(3)}
    assert set(losses) == expect
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # every stage contributes a real classification loss
    for i in range(3):
        assert float(losses[f'loss_cls_s{i}']) > 0


def test_cascade_grads_reach_all_heads(cascade):
    det, variables = cascade
    batch = make_batch()
    params = variables['params']

    @jax.jit
    def total(p):
        return sum(jax.tree.leaves(det.loss({'params': p}, batch)))

    g = total  # noqa
    grads = jax.jit(jax.grad(lambda p: sum(
        jax.tree.leaves(det.loss({'params': p, **{
            k: v for k, v in variables.items() if k != 'params'}},
            batch)))))(params)
    for i in range(3):
        gsum = sum(float(jnp.abs(x).sum())
                   for x in jax.tree.leaves(grads[f'bbox_head_{i}']))
        assert gsum > 0, f'stage {i} got no gradient'


def test_cascade_predict_shapes_and_ordering(cascade):
    det, variables = cascade
    batch = make_batch()
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape == (2, det.test_cfg.max_per_img, 4)
    scores = np.asarray(res.scores)
    mask = np.asarray(res.mask)
    for i in range(2):
        s = scores[i][mask[i]]
        assert (np.diff(s) <= 1e-6).all()  # descending
    b = np.asarray(res.bboxes)
    assert np.isfinite(b).all()
