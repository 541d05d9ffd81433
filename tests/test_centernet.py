"""CenterNet: gaussian target rendering oracle + loss/predict invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models import make_batch


def test_gaussian_radius_matches_reference_cases():
    from erd_tpu.ops.gaussian import gaussian_radius
    # reference torch implementation gives min of the three closed forms;
    # mirror a couple of hand-solved cases
    r = float(gaussian_radius(jnp.asarray(10.0), jnp.asarray(10.0),
                              min_overlap=0.7))
    # solve case2: 4r^2 - 2*20r + 0.3*100 = 0 -> r = (40 - sqrt(1600-480))/8
    import math
    r2 = (40 - math.sqrt(1600 - 4 * 4 * 30)) / 8
    r1 = (20 - math.sqrt(400 - 4 * 100 * 0.3 / 1.7)) / 2
    a3, b3, c3 = 4 * 0.7, -2 * 0.7 * 20, -0.3 * 100
    r3 = (-b3 + math.sqrt(b3 * b3 - 4 * a3 * c3)) / (2 * a3)
    assert r == pytest.approx(min(r1, r2, r3), rel=1e-5)


def test_render_center_targets():
    from erd_tpu.ops.gaussian import render_center_targets
    gb = jnp.asarray([[8.0, 8.0, 40.0, 24.0], [0, 0, 0, 0]])
    gl = jnp.asarray([2, 0], jnp.int32)
    gm = jnp.asarray([True, False])
    ratio = jnp.asarray([0.25, 0.25])  # stride 4
    heat, wh, off, w, avg = render_center_targets(gb, gl, gm, (16, 16), 4,
                                                  ratio)
    # center at ((8+40)/2*0.25, (8+24)/2*0.25) = (6.0, 4.0) -> int (6, 4)
    assert float(heat[4, 6, 2]) == pytest.approx(1.0)
    assert float(heat.sum()) > 1.0  # gaussian spread
    assert heat[..., 0].max() == 0  # padded gt rendered nothing
    np.testing.assert_allclose(np.asarray(wh[4, 6]), [8.0, 4.0])
    np.testing.assert_allclose(np.asarray(off[4, 6]), [0.0, 0.0])
    assert float(w.sum()) == 1.0
    assert float(avg) == 1.0


def test_local_maximum():
    from erd_tpu.ops.gaussian import local_maximum
    h = np.zeros((8, 8, 1), np.float32)
    h[3, 3, 0] = 1.0
    h[3, 4, 0] = 0.6  # suppressed by the neighbour peak
    out = np.asarray(local_maximum(jnp.asarray(h)))
    assert out[3, 3, 0] == 1.0 and out[3, 4, 0] == 0.0


@pytest.fixture(scope='module')
def centernet():
    from erd_tpu.models.detectors.centernet import CenterNetDetector
    det = CenterNetDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_loss_modes(centernet):
    det, variables = centernet
    losses = det.loss_jit(variables, make_batch())
    assert float(losses['loss_wh']) == 0
    assert float(losses['loss_offset']) == 0
    assert float(losses['loss_center_heatmap']) > 0
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_wh']) > 0
    assert float(losses['loss_offset']) > 0


def test_predict_contract(centernet):
    det, variables = centernet
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.scores.shape == (2, 100)
    assert res.mask.dtype == bool
    # stride-4 map from a 64x96 input
    imgs = jnp.zeros((1, 64, 96, 3), jnp.uint8)
    heat, wh, off = det.forward_jit(variables, imgs)
    assert heat.shape == (1, 16, 24, 4)
    s = np.asarray(heat)
    assert (s >= 0).all() and (s <= 1).all()


def test_centripetalnet_loss_and_predict():
    """CentripetalNet: guiding/centripetal shifts replace embeddings
    (centripetal_head.py)."""
    import jax
    import numpy as np
    from erd_tpu.models.detectors.centripetalnet import (
        CentripetalNetDetector)
    from tests.test_models import make_batch
    det = CentripetalNetDetector(
        num_classes=4, stage_channels=(16, 16, 24),
        stage_blocks=(1, 1, 1), downsample_times=2, corner_topk=20)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    losses = det.loss_jit(variables, batch)
    assert 'loss_guiding' in losses and 'loss_centripetal' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape[-1] == 4
