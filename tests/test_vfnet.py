"""VFNet: star-DCN offsets, refine chain, VFL/ATSS loss invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models import make_batch


@pytest.fixture(scope='module')
def vfnet():
    from erd_tpu.models.detectors.vfnet import VFNetDetector
    det = VFNetDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_star_offsets_layout():
    from erd_tpu.models.heads.vfnet_head import star_offsets, _BASE
    # one location, box distances (x1, y1, x2, y2) = (8, 16, 24, 32), stride 8
    bp = jnp.asarray([[[[8.0, 16.0, 24.0, 32.0]]]])
    off = np.asarray(star_offsets(bp, 8.0, gradient_mul=1.0))[0, 0, 0, 0]
    # feature-scale distances: x1=1, y1=2, x2=3, y2=4
    want_star = np.asarray([
        [-2, -1], [-2, 0], [-2, 3],
        [0, -1], [0, 0], [0, 3],
        [4, -1], [4, 0], [4, 3]], np.float32)
    np.testing.assert_allclose(off, want_star - _BASE, atol=1e-5)


def test_forward_shapes(vfnet):
    det, variables = vfnet
    imgs = jnp.zeros((1, 64, 96, 3), jnp.uint8)
    cls_lvl, ini_lvl, ref_lvl = det.forward_jit(variables, imgs)
    assert len(cls_lvl) == 5 and len(ref_lvl) == 5
    assert cls_lvl[0].shape == (1, 8, 12, 4)
    assert ini_lvl[0].shape == (1, 8, 12, 4)
    # distances are positive (exp) and refined = refine_factor * initial
    assert (np.asarray(ini_lvl[0]) > 0).all()
    assert (np.asarray(ref_lvl[0]) > 0).all()


def test_loss_modes(vfnet):
    det, variables = vfnet
    losses = det.loss_jit(variables, make_batch())
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_bbox_rf']) == 0
    assert float(losses['loss_cls']) > 0
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_bbox']) > 0
    assert float(losses['loss_bbox_rf']) > 0


def test_grads_flow(vfnet):
    det, variables = vfnet
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


def test_predict_contract(vfnet):
    det, variables = vfnet
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool
