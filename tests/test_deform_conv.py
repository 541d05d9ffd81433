"""Deformable convolution: naive-loop oracle parity + DCN-ResNet plugin.

The oracle below is a direct per-pixel loop implementation of the published
DCN v1/v2 semantics (bilinear sampling with zero padding at each kernel
point, optional modulation mask) — independent of the vectorized
gather+GEMM in erd_tpu/ops/deform_conv.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.ops.deform_conv import ModulatedDeformConv, deform_conv2d


def bilinear_zero_scalar(img, y, x):
    """img (H, W, C); scalar y/x; zero outside (per-corner)."""
    h, w, c = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = np.zeros((c,), np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                wgt = (1 - abs(y - yy)) * (1 - abs(x - xx))
                out += wgt * img[yy, xx]
    return out


def oracle_deform_conv(x, offset, weight, mask=None, stride=1, padding=1,
                       dilation=1, deform_groups=1):
    """x (H, W, Cin); offset (Ho, Wo, dg, K*K, 2); weight (K, K, Cin, Cout)."""
    k = weight.shape[0]
    cin, cout = weight.shape[2], weight.shape[3]
    ho, wo = offset.shape[:2]
    gch = cin // deform_groups
    out = np.zeros((ho, wo, cout), np.float64)
    for i in range(ho):
        for j in range(wo):
            for u in range(k):
                for v in range(k):
                    kidx = u * k + v
                    for g in range(deform_groups):
                        y = i * stride - padding + u * dilation + \
                            offset[i, j, g, kidx, 0]
                        xx = j * stride - padding + v * dilation + \
                            offset[i, j, g, kidx, 1]
                        samp = bilinear_zero_scalar(
                            x[..., g * gch:(g + 1) * gch], y, xx)
                        if mask is not None:
                            samp = samp * mask[i, j, g, kidx]
                        out[i, j] += samp @ weight[u, v,
                                                   g * gch:(g + 1) * gch]
    return out


@pytest.mark.parametrize('dg,stride,use_mask', [(1, 1, True), (1, 2, False),
                                                (2, 1, True)])
def test_deform_conv_matches_oracle(dg, stride, use_mask):
    rs = np.random.RandomState(0)
    h, w, cin, cout, k = 7, 8, 4, 5, 3
    ho = (h + 2 - k) // stride + 1
    wo = (w + 2 - k) // stride + 1
    x = rs.randn(h, w, cin).astype(np.float32)
    offset = (rs.randn(ho, wo, dg, k * k, 2) * 1.5).astype(np.float32)
    weight = rs.randn(k, k, cin, cout).astype(np.float32)
    mask = rs.rand(ho, wo, dg, k * k).astype(np.float32) if use_mask \
        else None

    got = jax.jit(lambda *a: deform_conv2d(
        *a, stride=stride, padding=1, deform_groups=dg))(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(mask) if use_mask else None)
    want = oracle_deform_conv(x, offset, weight, mask, stride=stride,
                              padding=1, deform_groups=dg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv():
    """offset=0, mask=1 reduces DCN to an ordinary 3x3 convolution."""
    rs = np.random.RandomState(1)
    x = rs.randn(9, 10, 6).astype(np.float32)
    weight = rs.randn(3, 3, 6, 4).astype(np.float32)
    offset = np.zeros((9, 10, 1, 9, 2), np.float32)
    mask = np.ones((9, 10, 1, 9), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(weight), jnp.asarray(mask)))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(weight), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_modulated_deform_conv_module_zero_init():
    """Zero-init offsets ⇒ the module starts as 0.5x a plain conv (DCNv2
    Pack init: mask = sigmoid(0) = 0.5)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    mod = ModulatedDeformConv(features=6)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(variables, x)
    kern = variables['params']['kernel']
    want = 0.5 * jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    assert out.shape == (2, 8, 8, 6)


def test_dcn_gradients_flow_to_offsets():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
    mod = ModulatedDeformConv(features=4)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return (mod.apply({'params': p}, x) ** 2).sum()

    g = jax.jit(jax.grad(loss))(variables['params'])
    # offset conv weights get gradient through the bilinear sampling
    assert float(jnp.abs(g['conv_offset']['kernel']).sum()) > 0
    assert float(jnp.abs(g['kernel']).sum()) > 0


def test_grouped_deform_conv_matches_per_group_runs():
    """conv_groups=G (ResNeXt's grouped deformable 3x3) == concatenating
    independent per-group deform convs over the channel slices."""
    rs = np.random.RandomState(4)
    h, w, cin, cout, k, g = 7, 8, 8, 6, 3, 2
    x = rs.randn(h, w, cin).astype(np.float32)
    offset = (rs.randn(h, w, 1, k * k, 2) * 1.5).astype(np.float32)
    mask = rs.rand(h, w, 1, k * k).astype(np.float32)
    weight = rs.randn(k, k, cin // g, cout).astype(np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        jnp.asarray(mask), conv_groups=g))

    cg, cog = cin // g, cout // g
    parts = [np.asarray(deform_conv2d(
        jnp.asarray(x[..., i * cg:(i + 1) * cg]), jnp.asarray(offset),
        jnp.asarray(weight[..., i * cog:(i + 1) * cog]), jnp.asarray(mask)))
        for i in range(g)]
    want = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_grouped_zero_offset_equals_plain_grouped_conv():
    rs = np.random.RandomState(5)
    g = 4
    x = rs.randn(6, 7, 8).astype(np.float32)
    weight = rs.randn(3, 3, 2, 8).astype(np.float32)  # cin/g = 2
    offset = np.zeros((6, 7, 1, 9, 2), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(weight), conv_groups=g))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(weight), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=g)[0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_resnext_dcn_stages():
    from erd_tpu.models.backbones.resnext import ResNeXt
    net = ResNeXt(depth=50, groups=32, base_width=4,
                  dcn_stages=(False, False, True, True))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    p = variables['params']
    assert 'conv_offset' in p['layer3_block0']['conv2']
    assert 'conv_offset' not in p['layer2_block0'].get('conv2', {})
    # grouped kernel layout: (K, K, width/groups, width)
    k3 = p['layer3_block0']['conv2']['kernel']
    assert k3.shape == (3, 3, 512 // 32, 512)
    outs = jax.jit(net.apply)(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_resnet_dcn_stages():
    from erd_tpu.models.backbones.resnet import ResNet
    net = ResNet(depth=50, dcn_stages=(False, False, True, True))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    p = variables['params']
    assert 'conv_offset' in p['layer3_block0']['conv2']
    assert 'conv_offset' in p['layer4_block0']['conv2']
    assert 'conv_offset' not in p['layer2_block0'].get('conv2', {})
    outs = jax.jit(net.apply)(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
