"""tools/model_converters round-trips on synthetic checkpoints.

Counterparts of reference/tools/model_converters/{regnet2mmdet,
detectron2pytorch, upgrade_model_version}.py — each converter's output must
be importable by erd_tpu's weight_import layer (the in-framework consumer),
and the class-channel surgeries must match the documented mmdet-1.x -> 2.x
semantics (background channel 0 -> last / dropped).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'tools/model_converters')


def test_regnet_key_rename():
    from regnet2erd import convert_key
    assert convert_key('stem.conv.weight') == 'conv1.weight'
    assert convert_key('stem.bn.running_mean') == 'bn1.running_mean'
    # block 1's proj/bn are the downsample pair; f.{a,b,c} -> conv{1,2,3}
    assert convert_key('s1.b1.proj.weight') == 'layer1.0.downsample.0.weight'
    assert convert_key('s1.b1.bn.running_var') == \
        'layer1.0.downsample.1.running_var'
    assert convert_key('s2.b3.f.b.weight') == 'layer2.2.conv2.weight'
    assert convert_key('s4.b1.f.c_bn.bias') == 'layer4.0.bn3.bias'
    assert convert_key('head.fc.weight') == 'fc.weight'
    with pytest.raises(ValueError):
        convert_key('s1.b1.f.se.weight')


def test_detectron_blobs_convert_and_import():
    """A full synthetic detectron R50 blob set converts with nothing
    skipped, and the result loads into an erd_tpu ResNet via
    load_torchvision_resnet."""
    from detectron2erd import ARCH, convert_blobs

    rs = np.random.RandomState(0)
    blobs = {'conv1_w': rs.randn(64, 3, 7, 7).astype(np.float32),
             'res_conv1_bn_s': rs.randn(64).astype(np.float32),
             'res_conv1_bn_b': rs.randn(64).astype(np.float32)}
    widths = [256, 512, 1024, 2048]
    for i, n_blocks in enumerate(ARCH[50], start=1):
        w, inner = widths[i - 1], widths[i - 1] // 4
        for j in range(n_blocks):
            cin = (widths[i - 2] if i > 1 else 64) if j == 0 else w
            if j == 0:
                blobs[f'res{i + 1}_{j}_branch1_w'] = \
                    rs.randn(w, cin, 1, 1).astype(np.float32)
                blobs[f'res{i + 1}_{j}_branch1_bn_s'] = \
                    rs.randn(w).astype(np.float32)
                blobs[f'res{i + 1}_{j}_branch1_bn_b'] = \
                    rs.randn(w).astype(np.float32)
            for k, letter in enumerate('abc'):
                ci = cin if k == 0 else inner
                co = w if k == 2 else inner
                ksz = 3 if k == 1 else 1
                blobs[f'res{i + 1}_{j}_branch2{letter}_w'] = \
                    rs.randn(co, ci, ksz, ksz).astype(np.float32)
                blobs[f'res{i + 1}_{j}_branch2{letter}_bn_s'] = \
                    rs.randn(co).astype(np.float32)
                blobs[f'res{i + 1}_{j}_branch2{letter}_bn_b'] = \
                    rs.randn(co).astype(np.float32)

    out, skipped = convert_blobs(blobs, 50)
    assert skipped == []
    assert out['layer1.0.downsample.0.weight'].shape == (256, 64, 1, 1)
    assert np.all(out['bn1.running_var'] == 1.0)

    import jax
    import jax.numpy as jnp
    from erd_tpu.models.backbones.resnet import ResNet
    from erd_tpu.models.weight_import import load_torchvision_resnet
    net = ResNet(depth=50)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3))))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    loaded, n = load_torchvision_resnet(variables, out, scope='')
    assert n == len(out)
    got = loaded['params']['layer1_block0']['conv2']['kernel']
    np.testing.assert_allclose(
        np.asarray(got),
        np.transpose(blobs['res2_0_branch2b_w'], (2, 3, 1, 0)))


def test_upgrade_reorders_background_channel():
    from upgrade_model_version import upgrade_state_dict

    nc = 5  # 4 classes + background (mmdet-1.x softmax layout)
    rs = np.random.RandomState(1)
    state = {
        'bbox_head.fc_cls.weight': rs.randn(nc, 8).astype(np.float32),
        'bbox_head.fc_cls.bias': rs.randn(nc).astype(np.float32),
        'bbox_head.fc_reg.weight': rs.randn(4 * nc, 8).astype(np.float32),
        'bbox_head.fc_reg.bias': rs.randn(4 * nc).astype(np.float32),
        'mask_head.conv_logits.weight':
            rs.randn(nc, 8, 1, 1).astype(np.float32),
        'backbone.conv1.weight': rs.randn(4, 3, 7, 7).astype(np.float32),
    }
    out = upgrade_state_dict(state, nc, two_stage=True)

    # head scopes move under roi_head., backbone does not
    assert 'roi_head.bbox_head.fc_cls.weight' in out
    assert 'backbone.conv1.weight' in out
    # cls: background row 0 moved to the end
    w = out['roi_head.bbox_head.fc_cls.weight']
    np.testing.assert_array_equal(w[-1], state['bbox_head.fc_cls.weight'][0])
    np.testing.assert_array_equal(w[:-1],
                                  state['bbox_head.fc_cls.weight'][1:])
    # reg: background class-group dropped -> 4*(nc-1) rows
    assert out['roi_head.bbox_head.fc_reg.weight'].shape[0] == 4 * (nc - 1)
    np.testing.assert_array_equal(
        out['roi_head.bbox_head.fc_reg.weight'],
        state['bbox_head.fc_reg.weight'][4:])
    # mask logits: background channel dropped
    assert out['roi_head.mask_head.conv_logits.weight'].shape[0] == nc - 1
