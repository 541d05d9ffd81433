"""YOLOv3 family tests: coding roundtrip, grid assignment, detector modes,
train-time BatchNorm state threading."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models.detectors.yolov3 import YOLOV3Detector
from erd_tpu.models.heads.yolo_head import (YOLOContext, yolo_decode,
                                            yolo_targets)
from erd_tpu.structures import GTInstances
from tests.test_models import make_batch


def test_yolo_context_shapes():
    ctx = YOLOContext.build((64, 96))
    # strides 32/16/8 -> (2x3 + 4x6 + 8x12) cells x 3 anchors
    assert ctx.num_level_anchors == (2 * 3 * 3, 4 * 6 * 3, 8 * 12 * 3)
    assert ctx.anchors.shape[0] == sum(ctx.num_level_anchors)


def test_yolo_decode_roundtrip():
    ctx = YOLOContext.build((64, 96))
    n = ctx.anchors.shape[0]
    raw = jnp.zeros((1, n, 85))
    boxes, obj, cls = yolo_decode(ctx, raw)
    # raw zeros: xy = cell + 0.5*stride, wh = anchor size
    b = np.asarray(boxes[0])
    wh = b[:, 2:] - b[:, :2]
    np.testing.assert_allclose(wh, ctx.anchor_wh, rtol=1e-5)
    ctr = (b[:, :2] + b[:, 2:]) / 2
    np.testing.assert_allclose(
        ctr, ctx.cell_xy + 0.5 * ctx.stride[:, None], rtol=1e-5)


def test_yolo_targets_responsible_cell():
    ctx = YOLOContext.build((64, 96))
    gt = GTInstances.pad(np.asarray([[30.0, 20.0, 60.0, 50.0]]),
                         np.asarray([2], np.int32), 4)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    t = yolo_targets(ctx, gt)
    pos = np.asarray(t.pos_mask[0])
    assert pos.sum() >= 1  # at least the forced best anchor
    # all positive anchors must have the gt center (45, 35) in their cell
    cx, cy = 45.0, 35.0
    cells = ctx.cell_xy[pos]
    strides = ctx.stride[pos]
    assert ((cells[:, 0] <= cx) & (cx < cells[:, 0] + strides)).all()
    assert ((cells[:, 1] <= cy) & (cy < cells[:, 1] + strides)).all()
    # xy target in (0, 1)
    xy = np.asarray(t.xy_t[0])[pos]
    assert ((xy > 0) & (xy < 1)).all()


@pytest.fixture(scope='module')
def yolo():
    det = YOLOV3Detector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_yolo_loss_and_state(yolo):
    det, variables = yolo
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    batch = make_batch(gts=gts)
    losses, consts = det.loss_and_state_jit(variables, batch)
    assert set(losses) == {'loss_cls', 'loss_conf', 'loss_xy', 'loss_wh'}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # BatchNorm running stats must actually move
    old = jax.tree.leaves(variables['batch_stats'])[0]
    new = jax.tree.leaves(consts['batch_stats'])[0]
    assert float(jnp.abs(old - new).sum()) > 0


def test_yolo_grads(yolo):
    det, variables = yolo
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


def test_yolo_predict(yolo):
    det, variables = yolo
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool


def test_yolo_trainer_integration():
    """End-to-end: the Trainer threads BatchNorm state for stateful models."""
    from erd_tpu.data import DetDataLoader, LoaderConfig
    from erd_tpu.engine import Trainer, TrainerConfig
    from erd_tpu.parallel import make_mesh
    from tests.test_engine import BlankPipe, SyntheticDataset

    det = YOLOV3Detector(num_classes=3)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    ds = SyntheticDataset(n=8)
    loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    tr = Trainer(det, loader,
                 TrainerConfig(epochs=1, base_lr=0.001, warmup_iters=2,
                               milestones_epochs=(), frozen_stages=-1),
                 mesh=make_mesh(), hooks=[])
    out = tr.fit(variables)
    # returned consts are the UPDATED BatchNorm stats
    old = jax.tree.leaves(variables['batch_stats'])[0]
    new = jax.tree.leaves(out['batch_stats'])[0]
    assert float(jnp.abs(np.asarray(old) - np.asarray(new)).sum()) > 0
