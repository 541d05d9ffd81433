"""Cascade Mask R-CNN: per-stage mask heads over the cascade box path.

Mirrors reference/mmdet/models/roi_heads/cascade_roi_head.py with mask
heads configured (configs/cascade_rcnn/cascade-mask-rcnn_r50_fpn_1x_coco.py):
each stage trains its own FCN mask head on its sampled RoIs, inference
averages the three heads' sigmoid probabilities on the final boxes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.structures import GTInstances, ImageMeta


def make_mask_batch(b=2, h=64, w=96, max_gt=8):
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, h, w, 3), dtype=np.uint8)
    gts, metas = [], []
    for i in range(b):
        boxes = np.asarray([[10.0, 10.0, 60.0, 50.0]], np.float32)
        crop = np.zeros((56, 56), np.uint8)
        crop[14:42, 14:42] = 1
        gts.append(GTInstances.pad(boxes, np.asarray([i % 3], np.int32),
                                   max_gt, masks=[crop]))
        metas.append(ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=i))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs), *gts)
    meta = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
    return dict(images=jnp.asarray(images), gt=gt, meta=meta)


@pytest.fixture(scope='module')
def cmrcnn():
    from erd_tpu.models.detectors.cascade_mask_rcnn import (
        CascadeMaskRCNNDetector)
    det = CascadeMaskRCNNDetector(num_classes=3, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_cascade_mask_loss_all_stages(cmrcnn):
    det, variables = cmrcnn
    losses = det.loss_jit(variables, make_mask_batch())
    expect = {'loss_rpn_cls', 'loss_rpn_bbox'} | {
        f'loss_{k}_s{i}' for k in ('cls', 'bbox', 'mask') for i in range(3)}
    assert set(losses) == expect
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    for i in range(3):
        assert float(losses[f'loss_mask_s{i}']) > 0


def test_cascade_mask_grads_reach_mask_heads(cmrcnn):
    det, variables = cmrcnn
    batch = make_mask_batch()
    consts = {k: v for k, v in variables.items() if k != 'params'}
    grads = jax.jit(jax.grad(lambda p: sum(
        jax.tree.leaves(det.loss({'params': p, **consts}, batch)))))(
            variables['params'])
    for i in range(3):
        g = grads[f'mask_head_{i}']
        norm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert norm > 0, f'mask_head_{i} got no gradient'


def test_cascade_mask_predict_shapes(cmrcnn):
    det, variables = cmrcnn
    batch = make_mask_batch()
    res, masks = det.predict_jit(variables, batch)
    b = batch['images'].shape[0]
    n = res.bboxes.shape[1]
    assert masks.shape == (b, n, det.mask_size, det.mask_size)
    assert np.asarray(masks).min() >= 0 and np.asarray(masks).max() <= 1


def test_cascade_mask_empty_gt_finite():
    from erd_tpu.models.detectors.cascade_mask_rcnn import (
        CascadeMaskRCNNDetector)
    det = CascadeMaskRCNNDetector(num_classes=3, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_mask_batch()
    gt = batch['gt']
    batch['gt'] = gt.replace(mask=jnp.zeros_like(gt.mask))
    losses = det.loss_jit(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
