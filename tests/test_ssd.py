"""SSD300 tests: anchor scheme, hard-negative mining, detector modes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models.detectors.ssd import SSDDetector
from erd_tpu.models.heads.ssd_head import (SSDAnchorContext, ssd300_sizes)
from tests.test_models import make_batch


def test_ssd300_sizes():
    sizes = ssd300_sizes(300, (0.15, 0.9))
    assert len(sizes) == 6
    mins = [s[0] for s in sizes]
    # first level is the special small scale, then 45..261 step 54
    assert mins[0] == 21
    np.testing.assert_allclose(mins[1:], [45, 99, 153, 207, 261])
    # max of level i == min of level i+1
    for i in range(len(sizes) - 1):
        assert sizes[i][1] == pytest.approx(sizes[i + 1][0])


def test_ssd_anchor_context():
    ctx = SSDAnchorContext.build((300, 300))
    assert ctx.anchors_per_cell == (4, 6, 6, 6, 4, 4)
    assert ctx.featmap_sizes[0] == (38, 38)
    assert ctx.featmap_sizes[-1] == (1, 1)
    assert ctx.anchors.shape[0] == sum(
        h * w * a for (h, w), a in zip(ctx.featmap_sizes,
                                      ctx.anchors_per_cell))
    # 8732 anchors for the canonical 300 input
    assert ctx.anchors.shape[0] == 8732


@pytest.fixture(scope='module')
def ssd():
    det = SSDDetector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0))
    return det, variables


def test_ssd_backbone_level_shapes(ssd):
    det, variables = ssd
    imgs = jnp.zeros((1, 300, 300, 3), jnp.uint8)
    cls_lvl, reg_lvl = det.forward_jit(variables, imgs)
    hw = [tuple(m.shape[1:3]) for m in cls_lvl]
    assert hw == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]


def test_ssd_loss_and_mining(ssd):
    det, variables = ssd
    gts = [([[30, 30, 120, 120]], [1]), ([[50, 50, 200, 220]], [2])]
    batch = make_batch(b=2, h=300, w=300, gts=gts)
    losses = det.loss_jit(variables, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    for v in losses.values():
        assert np.isfinite(float(v)) and float(v) > 0


def test_ssd_grads(ssd):
    det, variables = ssd
    batch = make_batch(b=2, h=300, w=300,
                       gts=[([[30, 30, 120, 120]], [1]), ([], [])])
    params = variables['params']

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p}, batch).values())

    grads = jax.grad(total)(params)
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0
    # L2Norm scale learns too
    assert float(jnp.abs(
        grads['backbone']['l2_norm']['scale']).sum()) > 0


def test_ssd_predict(ssd):
    det, variables = ssd
    batch = make_batch(b=2, h=300, w=300)
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape == (2, 200, 4)
    assert res.mask.dtype == bool


def test_pisa_ssd_identity_limits_match_plain_ssd():
    """Analytic pin of the PISA composition (pisa_ssd_head.py:128-163):
    with isr k=0, bias=0 the ISR weights are identically 1 so loss_cls
    equals plain SSD's; with carl k=1, bias=1 the CARL scale is
    identically 1 so loss_carl equals loss_bbox (both SmoothL1 beta=1
    normalized by num_pos)."""
    import jax
    import numpy as np
    from erd_tpu.models.detectors.pisa_ssd import PISASSDDetector
    from erd_tpu.models.detectors.ssd import SSDDetector
    from tests.test_models import make_batch

    gts = [([[30, 30, 150, 150]], [1]),
           ([[50, 50, 180, 200], [120, 40, 260, 180]], [0, 2])]
    batch = make_batch(h=300, w=300, gts=gts)
    pisa = PISASSDDetector(num_classes=4, isr_k=0.0, isr_bias=0.0,
                           carl_k=1.0, carl_bias=1.0)
    variables = pisa.init(jax.random.PRNGKey(0))
    plain = SSDDetector(num_classes=4)
    l_pisa = jax.jit(pisa.loss)(variables, batch)
    l_plain = jax.jit(plain.loss)(variables, batch)
    np.testing.assert_allclose(float(l_pisa['loss_cls']),
                               float(l_plain['loss_cls']), rtol=1e-5)
    np.testing.assert_allclose(float(l_pisa['loss_bbox']),
                               float(l_plain['loss_bbox']), rtol=1e-5)
    np.testing.assert_allclose(float(l_pisa['loss_carl']),
                               float(l_pisa['loss_bbox']), rtol=1e-5)
    # real PISA weights actually change the cls loss
    pisa2 = PISASSDDetector(num_classes=4)  # k=2, bias=0
    l2 = jax.jit(pisa2.loss)(variables, batch)
    assert np.isfinite(float(l2['loss_cls']))
    assert abs(float(l2['loss_carl']) - float(l2['loss_bbox'])) > 1e-8


def test_ssd512_anchor_scheme():
    """SSD512: 7 levels, strides 8..512, basesize range (0.1, 0.9)
    (reference configs/ssd/ssd512_coco.py anchor_generator)."""
    from erd_tpu.models.heads.ssd_head import ssd_sizes
    sizes = ssd_sizes(512)
    # int-truncating SSDAnchorGenerator values (anchor_generator.py:548-566)
    assert sizes == [(20, 51), (51, 133), (133, 215), (215, 296),
                     (296, 378), (378, 460), (460, 542)]
    ctx = SSDAnchorContext.build((512, 512), 512)
    assert ctx.anchors_per_cell == (4, 6, 6, 6, 6, 4, 4)
    assert ctx.featmap_sizes == ((64, 64), (32, 32), (16, 16), (8, 8),
                                 (4, 4), (2, 2), (1, 1))
    # 24564 anchors for the canonical 512 input
    assert ctx.anchors.shape[0] == sum(
        h * w * a for (h, w), a in zip(ctx.featmap_sizes,
                                       ctx.anchors_per_cell))


@pytest.mark.slow
def test_ssd512_detector_modes():
    det = SSDDetector(num_classes=4, input_size=512)
    variables = det.init(jax.random.PRNGKey(0))
    imgs = jnp.zeros((1, 512, 512, 3), jnp.uint8)
    cls_lvl, _ = det.forward_jit(variables, imgs)
    hw = [tuple(m.shape[1:3]) for m in cls_lvl]
    # extra s2 pairs + final 4x4/s1/p1 conv: 64 -> ... -> 2 -> 1
    assert hw == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2),
                  (1, 1)]
    batch = make_batch(b=1, h=512, w=512)
    losses = det.loss_jit(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape[1] == det.test_cfg.max_per_img


def test_ssdlite_anchor_context_matches_levels():
    """SSDLite 320: explicit strides/ratios/sizes tables (reference
    configs/ssd/ssdlite_mobilenetv2-scratch_8xb24-600e_coco.py)."""
    from erd_tpu.models.detectors.ssd import (
        SSDLITE_RATIOS, SSDLITE_SIZES, SSDLITE_STRIDES)
    ctx = SSDAnchorContext.build((320, 320), strides=SSDLITE_STRIDES,
                                 lvl_ratios=SSDLITE_RATIOS,
                                 level_sizes=SSDLITE_SIZES)
    assert ctx.featmap_sizes == ((20, 20), (10, 10), (5, 5), (3, 3),
                                 (2, 2), (1, 1))
    # ratios [2, 3] everywhere -> 6 anchors per cell on all levels
    assert ctx.anchors_per_cell == (6,) * 6
    assert ctx.anchors.shape[0] == 6 * (400 + 100 + 25 + 9 + 4 + 1)


@pytest.mark.slow
def test_ssdlite_detector_modes():
    from erd_tpu.models.detectors.ssd import SSDLiteDetector
    det = SSDLiteDetector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0))
    assert 'batch_stats' in variables  # depthwise head/extras carry BN
    imgs = jnp.zeros((1, 320, 320, 3), jnp.uint8)
    cls_lvl, _ = det.forward_jit(variables, imgs)
    hw = [tuple(m.shape[1:3]) for m in cls_lvl]
    # C4 (s16) + C5 (s32) + four s2 depthwise extras: 20 -> ... -> 1
    assert hw == [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]
    batch = make_batch(b=1, h=320, w=320)
    losses, new_state = jax.jit(det.loss_and_state)(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # BN statistics actually move under the training step
    before = jax.tree.leaves(variables['batch_stats'])
    after = jax.tree.leaves(new_state['batch_stats'])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape[1] == det.test_cfg.max_per_img
