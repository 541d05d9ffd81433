"""Forward-shape + invariant tests for the new backbones
(MobileNetV2 / Res2Net / RegNet / HRNet / Hourglass) and the new necks
(BFP / HRFPN / FPN_CARAFE / DilatedEncoder)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _img(h=64, w=64, c=3):
    return jnp.asarray(
        np.random.RandomState(0).randn(1, h, w, c), jnp.float32)


def test_mobilenet_v2_shapes():
    from erd_tpu.models.backbones import MobileNetV2
    m = MobileNetV2()
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # strides 4, 8, 16, 32; channels 24, 32, 96, 1280
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [24, 32, 96, 1280]


def test_res2net_shapes_and_split_structure():
    from erd_tpu.models.backbones import Res2Net
    m = Res2Net(depth=50)
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    # Bottle2neck has scales-1 = 3 hierarchical 3x3 convs
    p = v['params']['layer1_block0']
    assert 'conv2_0' in p and 'conv2_2' in p and 'conv2_3' not in p


def test_regnet_width_generation_matches_reference_values():
    from erd_tpu.models.backbones.regnet import regnet_stages
    widths, depths, groups = regnet_stages('regnetx_3.2gf')
    # published regnetx_3.2gf stage widths/depths (pycls)
    assert widths == [96, 192, 432, 1008]
    assert depths == [2, 6, 15, 2]
    assert sum(depths) == 25


def test_regnet_forward():
    from erd_tpu.models.backbones import RegNet
    m = RegNet(arch='regnetx_400mf')
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    from erd_tpu.models.backbones.regnet import regnet_stages
    widths, _, _ = regnet_stages('regnetx_400mf')
    assert [o.shape[-1] for o in outs] == widths
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_hrnet_branches():
    from erd_tpu.models.backbones import HRNet
    m = HRNet(width=18, num_modules=(1, 1, 1))  # light for test
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_hrfpn_on_hrnet():
    from erd_tpu.models.backbones import HRNet
    from erd_tpu.models.necks.pyramid_extras import HRFPN
    m = HRNet(width=18, num_modules=(1, 1, 1))
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    neck = HRFPN(out_channels=32, num_outs=5)
    nv = neck.init(jax.random.PRNGKey(1), feats)
    outs = neck.apply(nv, feats)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 32 for o in outs)


def test_hourglass_two_stacks():
    from erd_tpu.models.backbones import HourglassNet
    m = HourglassNet(downsample_times=2, num_stacks=2,
                     stage_channels=(16, 16, 24), stage_blocks=(1, 1, 1),
                     feat_channel=16)
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(v, x, train=True, mutable=['batch_stats'])
    assert len(outs) == 2
    assert all(o.shape == (1, 16, 16, 16) for o in outs)


def test_bfp_preserves_shapes_and_residual():
    from erd_tpu.models.necks.pyramid_extras import BFP
    feats = tuple(
        jnp.asarray(np.random.RandomState(i).randn(1, 2 ** (4 - i),
                                                   2 ** (4 - i), 8),
                    jnp.float32) for i in range(4))
    neck = BFP(num_levels=4, refine_level=1, refine_type='conv')
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]


def test_fpn_carafe_shapes():
    from erd_tpu.models.necks.pyramid_extras import FPNCARAFE
    feats = tuple(
        jnp.asarray(np.random.RandomState(i).randn(
            1, 16 // 2 ** i, 16 // 2 ** i, 8 * 2 ** i), jnp.float32)
        for i in range(4))
    neck = FPNCARAFE(in_channels=(8, 16, 32, 64), out_channels=16,
                     num_outs=5)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert all(o.shape[-1] == 16 for o in outs)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]


def test_pvtv2_shapes():
    from erd_tpu.models.backbones import PVTv2
    m = PVTv2(arch='b0')
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [32, 64, 160, 256]


def test_efficientnet_shapes():
    from erd_tpu.models.backbones import EfficientNet
    m = EfficientNet(arch='b0')
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(v, x, train=True, mutable=['batch_stats'])
    # stages (2, 3, 4, 5) at strides 8, 16, 16, 32; B0 channels
    assert [o.shape[-1] for o in outs] == [40, 80, 112, 192]
    assert [o.shape[1] for o in outs] == [8, 4, 4, 2]


def test_resnest_shapes():
    from erd_tpu.models.backbones import ResNeSt
    m = ResNeSt(depth=50)
    x = _img()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_dyhead_preserves_shapes():
    from erd_tpu.models.necks import DyHead
    feats = tuple(
        jnp.asarray(np.random.RandomState(i).randn(
            1, 16 // 2 ** i, 16 // 2 ** i, 32), jnp.float32)
        for i in range(3))
    neck = DyHead(num_blocks=2, out_channels=32)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]


def test_nasfpn_topology():
    from erd_tpu.models.necks import NASFPN
    feats = tuple(
        jnp.asarray(np.random.RandomState(i).randn(
            1, 32 // 2 ** i, 32 // 2 ** i, 16 * 2 ** i), jnp.float32)
        for i in range(3))
    neck = NASFPN(in_channels=(16, 32, 64), out_channels=24,
                  stack_times=2)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 24 for o in outs)


def test_ssh_context_module():
    from erd_tpu.models.necks import SSH
    feats = (jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16),
                         jnp.float32),)
    neck = SSH(out_channels=32)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert outs[0].shape == (1, 8, 8, 32)
    # half + quarter + quarter channel split
    assert (np.asarray(outs[0]) >= 0).all()  # relu'd concat


def test_fpg_neck_shapes_and_skip_stages():
    """FPG: 9 bottom-up grid stages over 5 levels; output channels and
    per-level strides match an FPN drop-in; the skip_inds staircase means
    early stages leave upper levels untouched (param names pinned)."""
    import jax
    import jax.numpy as jnp
    from erd_tpu.models.necks.fpg import FPG
    neck = FPG(in_channels=(16, 32, 64, 128), out_channels=24,
               inter_channels=24, stack_times=3,
               skip_inds=((0, 1), (0,), (), (), ()))
    feats = [jnp.ones((1, 32 // (2 ** i), 32 // (2 ** i), c))
             for i, c in enumerate((16, 32, 64, 128))]
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert o.shape == (1, 32 // (2 ** i), 32 // (2 ** i), 24), o.shape
    names = str(jax.tree_util.tree_structure(v))
    # level 0 skips stages 0 and 1 -> its first transition is at stage 2
    assert 's0_l0_lateral' not in names and 's2_l0_lateral' in names
    assert 's0_l2_lateral' in names


def test_convnext_tiny_shapes():
    """ConvNeXt-T: strides 4/8/16/32, dims 96/192/384/768; block is a
    residual with layer-scale (zero-ish init -> near-identity blocks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from erd_tpu.models.backbones.convnext import ConvNeXt, ConvNeXtBlock
    net = ConvNeXt(arch='tiny')
    x = jnp.ones((1, 64, 64, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 384), (1, 2, 2, 768)]
    blk = ConvNeXtBlock(16)
    xb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    vb = blk.init(jax.random.PRNGKey(2), xb)
    # layer_scale gamma=1e-6 -> block ~ identity at init
    np.testing.assert_allclose(np.asarray(blk.apply(vb, xb)),
                               np.asarray(xb), atol=1e-4)
