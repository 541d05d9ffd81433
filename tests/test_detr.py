"""DETR family tests: Hungarian matching, positional encoding, set losses,
detector modes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from erd_tpu.models.detectors.detr import DETRDetector
from erd_tpu.models.heads.detr_head import (cxcywh_to_xyxy,
                                            sine_positional_encoding,
                                            xyxy_to_cxcywh)
from erd_tpu.task.hungarian import hungarian_match
from tests.test_models import make_batch


def test_hungarian_matches_scipy(rng):
    b, q, g = 3, 10, 5
    cost = rng.rand(b, q, g).astype(np.float32)
    mask = np.ones((b, g), bool)
    mask[1, 3:] = False  # padded gts
    got = np.asarray(jax.jit(hungarian_match)(jnp.asarray(cost),
                                              jnp.asarray(mask)))
    for i in range(b):
        c = cost[i].copy()
        c[:, ~mask[i]] = 1e6
        r, col = linear_sum_assignment(c)
        want = np.full(q, -1)
        for rr, cc in zip(r, col):
            if mask[i, cc]:
                want[rr] = cc
        np.testing.assert_array_equal(got[i], want)
    # every valid gt is matched exactly once
    for i in range(b):
        vals = got[i][got[i] >= 0]
        assert len(set(vals.tolist())) == mask[i].sum()


def test_box_format_roundtrip(rng):
    from tests.conftest import rand_boxes
    b = rand_boxes(rng, 12)
    back = np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, rtol=1e-5, atol=1e-4)


def test_sine_positional_encoding():
    mask = jnp.ones((8, 12), bool)
    pos = sine_positional_encoding(mask, num_feats=64)
    assert pos.shape == (8, 12, 128)
    p = np.asarray(pos)
    assert np.abs(p).max() <= 1 + 1e-6
    # distinct positions get distinct encodings
    assert not np.allclose(p[0, 0], p[7, 11])


@pytest.fixture(scope='module')
def detr():
    det = DETRDetector(num_classes=4, depth=18, num_queries=20)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_detr_loss(detr):
    det, variables = detr
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    # 6 decoder layers x 3 terms
    assert len(losses) == 18
    assert 'loss_cls' in losses and 'loss_cls_aux0' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_detr_grads(detr):
    det, variables = detr
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p, **consts}, batch).values())

    grads = jax.grad(total)(params)
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0
    # query embeddings learn
    assert float(jnp.abs(
        grads['bbox_head']['query_embed']).sum()) > 0


def test_detr_predict(detr):
    det, variables = detr
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 20 * 4, 4) or \
        res.bboxes.shape == (2, 80, 4)
    b = np.asarray(res.bboxes)
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
