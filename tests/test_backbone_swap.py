"""Backbone swapping: configs with backbone=dict(type=...) assemble real
training-capable detectors (the registry-free analogue of mmdet's
pluggable MODELS backbones — configs/swin, configs/regnet, ...)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_head_loss_oracle import _pad_gt, _rand_gt


def _batch(h, w, n_classes=3):
    from erd_tpu.structures import ImageMeta
    rng = np.random.RandomState(0)
    boxes, labels = _rand_gt(rng, 2, h, w)
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      _pad_gt(boxes, labels % n_classes))
    meta = jax.tree.map(lambda *xs: jnp.stack(xs),
                        ImageMeta.make((h, w), (h, w), (1.0, 1.0)))
    return dict(images=jnp.zeros((1, h, w, 3), jnp.uint8), gt=gt,
                meta=meta)


def test_gfl_with_pvt_backbone_trains():
    from erd_tpu.models import GFLDetector
    det = GFLDetector(num_classes=3,
                      backbone=dict(type='PVTv2', arch='b0'))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    assert 'backbone' in variables['params']
    # a PVT-specific param exists where ResNet has none
    flat = '/'.join(str(k) for k in
                    jax.tree_util.tree_flatten_with_path(
                        variables['params']['backbone'])[0][0][0])
    losses = det.loss_jit(variables, _batch(64, 96))
    grads = jax.jit(jax.grad(
        lambda p: sum(jax.tree.leaves(det.loss(
            {'params': p}, _batch(64, 96))))))(variables['params'])
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree.leaves(grads['backbone']))
    assert gsum > 0  # grads reach the swapped backbone
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)


def test_faster_rcnn_with_regnet_backbone():
    from erd_tpu.models import FasterRCNNDetector
    det = FasterRCNNDetector(num_classes=3,
                             backbone=dict(type='RegNet',
                                           arch='regnetx_400mf'))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    losses = det.loss_jit(variables, _batch(64, 96))
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
            'loss_bbox'} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    res = det.predict_jit(variables, _batch(64, 96))
    assert res.bboxes.shape[0] == 1
