"""Model-zoo detector tests: the reference's detector-mode test pattern
(test_single_stage.py: build, run loss/predict on fake inputs) applied to
RetinaNet / FCOS / ATSS."""
import numpy as np
import jax
import pytest

from erd_tpu.models import ATSSDetector, FCOSDetector, RetinaNetDetector
from tests.test_models import make_batch

CASES = [
    ('retina', lambda: RetinaNetDetector(num_classes=4, depth=18)),
    ('fcos', lambda: FCOSDetector(num_classes=4, depth=18)),
    ('atss', lambda: ATSSDetector(num_classes=4, depth=18)),
]


@pytest.fixture(scope='module', params=CASES, ids=[c[0] for c in CASES])
def det_and_vars(request):
    det = request.param[1]()
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_loss_modes(det_and_vars):
    det, variables = det_and_vars
    # empty gt: cls loss > 0, bbox-ish losses == 0
    losses = det.loss_jit(variables, make_batch())
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) == 0
    # with gt: everything > 0 and finite
    gts = [([[10, 10, 60, 50]], [1]),
           ([[5, 5, 40, 40], [30, 10, 80, 60]], [0, 2])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_bbox']) > 0


def test_grads_flow(det_and_vars):
    det, variables = det_and_vars
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


def test_predict_shapes(det_and_vars):
    det, variables = det_and_vars
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.scores.shape == (2, 100)
    assert res.mask.dtype == bool
