"""SOLOv2: paste/assignment unit tests + loss/predict invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_mask_rcnn import make_mask_batch


def test_paste_crop_geometry():
    from erd_tpu.models.detectors.solov2 import paste_crop
    crop = jnp.ones((56, 56), jnp.float32)
    # box (8, 8, 24, 24) on a 16x24 stride-4 grid (64x96 image)
    out = np.asarray(paste_crop(crop, jnp.asarray([8., 8., 24., 24.]),
                                16, 24, 4.0))
    assert out.shape == (16, 24)
    # pixels at centers (2..5)*4+2 = 10..22 in y/x are inside the box
    assert out[3, 3] > 0.9 and out[4, 4] > 0.9
    assert out[0, 0] == 0 and out[10, 10] == 0  # outside box


def test_solo_targets_single_assigns_center_cells():
    from erd_tpu.models.detectors.solov2 import (NUM_GRIDS,
                                                 solo_targets_single)
    g = 4
    gt_b = jnp.zeros((g, 4), jnp.float32).at[0].set(
        jnp.asarray([100., 100., 160., 160.]))  # sqrt(area)=60 -> lvl 0/1
    gt_l = jnp.zeros((g,), jnp.int32).at[0].set(2)
    gt_m = jnp.zeros((g,), bool).at[0].set(True)
    crops = jnp.zeros((g, 56, 56), jnp.uint8).at[0].set(1)
    labels, pair_cell, pair_valid, masks = solo_targets_single(
        gt_b, gt_l, gt_m, crops, 80, 120, 4.0, num_classes=3, max_pos=64)
    labels = np.asarray(labels)
    assert (labels == 2).sum() > 0          # some positive cells
    assert int(np.asarray(pair_valid).sum()) > 0
    # positive pair masks are non-empty exactly where valid
    m = np.asarray(masks)
    pv = np.asarray(pair_valid)
    assert (m[pv].sum(axis=(1, 2)) > 0).all()
    assert (m[~pv].sum(axis=(1, 2)) == 0).all()
    # sqrt(area)=60 is in ranges (1,96) and (48,192) -> exactly 2 levels
    lv_hits = set()
    offs = np.cumsum([0] + [s * s for s in NUM_GRIDS])
    for c in np.asarray(pair_cell)[pv]:
        lv_hits.add(int(np.searchsorted(offs, c, side='right') - 1))
    assert lv_hits == {0, 1}


@pytest.fixture(scope='module')
def solov2():
    from erd_tpu.models.detectors.solov2 import SOLOV2Detector
    det = SOLOV2Detector(num_classes=4, depth=18, max_pos=32, nms_pre=64)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_loss_modes(solov2):
    det, variables = solov2
    batch = make_mask_batch()
    # empty gt: zero out validity
    empty = dict(batch)
    empty['gt'] = batch['gt'].replace(
        mask=jnp.zeros_like(batch['gt'].mask))
    losses = det.loss_jit(variables, empty)
    assert float(losses['loss_mask']) == 0
    assert float(losses['loss_cls']) > 0
    losses = det.loss_jit(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_mask']) > 0


def test_grads_flow(solov2):
    det, variables = solov2
    batch = make_mask_batch()
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p, **consts}, batch).values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_predict_contract(solov2):
    det, variables = solov2
    res, crops = det.predict_jit(variables, make_mask_batch())
    assert res.bboxes.shape == (2, 64, 4)  # capped at min(max_per_img,k)
    assert crops.shape[0] == 2 and crops.shape[-2:] == (28, 28)
    assert res.mask.dtype == bool
