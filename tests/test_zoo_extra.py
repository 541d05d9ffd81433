"""Extra zoo components: losses, necks, ResNeXt, LD detector, EMA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from erd_tpu.engine import ema_update, exp_momentum
from erd_tpu.losses import (dice_loss, gaussian_focal_loss, ghm_c_loss,
                            varifocal_loss)
from erd_tpu.models import LDDetector
from erd_tpu.models.backbones.resnext import ResNeXt
from erd_tpu.models.necks.extra_necks import ChannelMapper, PAFPN
from tests.test_models import make_batch


def test_varifocal_matches_reference_formula(rng):
    n, c = 32, 5
    pred = rng.randn(n, c).astype(np.float32)
    target = (rng.rand(n, c) * (rng.rand(n, c) > 0.8)).astype(np.float32)
    got = np.asarray(varifocal_loss(jnp.asarray(pred), jnp.asarray(target),
                                    reduction='none'))
    tp = torch.as_tensor(pred)
    tt = torch.as_tensor(target)
    ps = tp.sigmoid()
    fw = tt * (tt > 0).float() + \
        0.75 * (ps - tt).abs().pow(2.0) * (tt <= 0).float()
    want = (F.binary_cross_entropy_with_logits(tp, tt, reduction='none') *
            fw).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ghm_c_basic(rng):
    n, c = 64, 4
    pred = rng.randn(n, c).astype(np.float32)
    target = (rng.rand(n, c) > 0.9).astype(np.float32)
    lw = np.ones((n, c), np.float32)
    loss = float(ghm_c_loss(jnp.asarray(pred), jnp.asarray(target),
                            jnp.asarray(lw)))
    assert np.isfinite(loss) and loss > 0


def test_gaussian_focal(rng):
    pred = jnp.asarray(rng.rand(16, 3).astype(np.float32) * 0.98 + 0.01)
    tgt = jnp.zeros((16, 3)).at[0, 0].set(1.0)
    loss = float(gaussian_focal_loss(pred, tgt))
    assert np.isfinite(loss) and loss > 0


def test_dice_perfect_is_zero():
    pred = jnp.asarray([[10.0, -10.0, 10.0, -10.0]])
    tgt = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    assert float(dice_loss(pred, tgt)) < 1e-2


def test_pafpn_shapes(rng):
    neck = PAFPN(in_channels=(8, 16, 32), out_channels=8, num_outs=5)
    ins = [jnp.zeros((1, 32, 32, 8)), jnp.zeros((1, 16, 16, 16)),
           jnp.zeros((1, 8, 8, 32))]
    vars_ = jax.jit(neck.init)(jax.random.PRNGKey(0), ins)
    outs = jax.jit(neck.apply)(vars_, ins)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 8), (1, 16, 16, 8), (1, 8, 8, 8), (1, 4, 4, 8),
        (1, 2, 2, 8)]


def test_channel_mapper_shapes():
    neck = ChannelMapper(in_channels=(16, 32), out_channels=8, num_outs=4)
    ins = [jnp.zeros((1, 16, 16, 16)), jnp.zeros((1, 8, 8, 32))]
    vars_ = jax.jit(neck.init)(jax.random.PRNGKey(0), ins)
    outs = jax.jit(neck.apply)(vars_, ins)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 8), (1, 4, 4, 8), (1, 2, 2, 8)]


def test_resnext_forward():
    net = ResNeXt(depth=50, groups=4, base_width=4)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(net.apply)(vars_, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


@pytest.mark.slow
def test_ld_detector_losses():
    det = LDDetector(num_classes=3, depth=18)
    teacher_vars = det.teacher.init(jax.random.PRNGKey(0),
                                    image_shape=(64, 96))
    student_vars = det.init(jax.random.PRNGKey(1), image_shape=(64, 96))
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [2])]
    batch = make_batch(gts=gts)
    losses = det.loss_jit(student_vars, batch,
                          teacher_variables=teacher_vars)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_dfl', 'loss_ld'}
    for v in losses.values():
        assert np.isfinite(float(v))
    # teacher == student -> ld loss exactly 0
    losses_same = det.loss_jit(teacher_vars if False else student_vars,
                               batch, teacher_variables=student_vars)
    assert float(losses_same['loss_ld']) < 1e-8


def test_ema():
    p = {'w': jnp.ones((3,))}
    e = {'w': jnp.zeros((3,))}
    out = ema_update(e, p, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out['w']), 0.1, rtol=1e-6)
    m0 = float(exp_momentum(2e-4, 0, gamma=2000))
    m_inf = float(exp_momentum(2e-4, 10**7, gamma=2000))
    assert m0 > 0.9 and abs(m_inf - 2e-4) < 1e-6


def test_swin_tiny_forward():
    from erd_tpu.models.backbones.swin import SwinTransformer
    net = SwinTransformer(arch='tiny', window_size=7)
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(net.apply)(vars_, x)
    assert [o.shape[-1] for o in outs] == [96, 192, 384, 768]
    assert outs[0].shape[1:3] == (56, 56)
    assert outs[3].shape[1:3] == (7, 7)
    n_params = sum(p.size for p in jax.tree.leaves(vars_['params']))
    assert 25e6 < n_params < 32e6  # Swin-T ~28M


def test_swin_window_roundtrip():
    from erd_tpu.models.backbones.swin import (window_partition,
                                               window_reverse)
    x = jnp.arange(2 * 14 * 14 * 3, dtype=jnp.float32).reshape(2, 14, 14, 3)
    back = window_reverse(window_partition(x, 7), 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_seesaw_loss_basic(rng):
    from erd_tpu.losses import seesaw_loss
    pred = jnp.asarray(rng.randn(16, 5).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 5, 16))
    cum = jnp.asarray([1000.0, 100.0, 10.0, 1.0, 500.0])
    loss = float(seesaw_loss(pred, target, cum))
    assert np.isfinite(loss) and loss > 0
    # balanced counts reduce to plain CE
    cum_eq = jnp.full((5,), 100.0)
    from erd_tpu.losses import cross_entropy_loss
    l1 = float(seesaw_loss(pred, target, cum_eq, q=0.0))
    l2 = float(cross_entropy_loss(pred, target))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
