"""GCNet ContextBlock + GeneralizedAttention backbone plugins."""
import jax
import jax.numpy as jnp
import numpy as np


def test_context_block_identity_at_init_and_context_pooling():
    from erd_tpu.models.plugins import ContextBlock
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 5, 16))
    cb = ContextBlock(ratio=0.25)
    v = cb.init(jax.random.PRNGKey(1), x)
    # zero-init final transform conv -> exact identity at init
    np.testing.assert_allclose(np.asarray(cb.apply(v, x)),
                               np.asarray(x), atol=1e-6)
    # with uniform mask scores the pooled context is the spatial mean
    v2 = jax.tree.map(jnp.zeros_like, v)
    b, h, w, c = x.shape
    scores = jnp.zeros((b, h * w, 1))
    attn = jax.nn.softmax(scores, axis=1)
    ctx = jnp.einsum('bpc,bpk->bkc', x.reshape(b, h * w, c), attn)
    np.testing.assert_allclose(np.asarray(ctx[:, 0]),
                               np.asarray(x.mean(axis=(1, 2))), atol=1e-5)


def test_generalized_attention_identity_at_init_and_shapes():
    from erd_tpu.models.plugins import GeneralizedAttention
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 6, 32))
    ga = GeneralizedAttention(num_heads=4, kv_stride=2)
    v = ga.init(jax.random.PRNGKey(1), x)
    y = ga.apply(v, x)
    assert y.shape == x.shape
    # zero-init projection conv -> identity at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_resnet_plugin_stages_add_params():
    from erd_tpu.models.backbones.resnet import ResNet
    x = jnp.zeros((1, 32, 32, 3))
    plain = ResNet(depth=50).init(jax.random.PRNGKey(0), x)
    with_cb = ResNet(depth=50,
                     context_block_stages=(False, False, False, True),
                     gen_attention_stages=(False, False, False, True)
                     ).init(jax.random.PRNGKey(0), x)
    pn = sum(p.size for p in jax.tree.leaves(plain))
    cn = sum(p.size for p in jax.tree.leaves(with_cb))
    assert cn > pn
    names = str(jax.tree_util.tree_structure(with_cb))
    assert 'context_block' in names and 'gen_attention' in names


def test_wsconv_standardizes_weights():
    """WSConv: effective kernel has ~zero mean / unit std per out channel,
    and matches a plain conv run with the standardized kernel."""
    from erd_tpu.models.layers import WSConv
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    conv = WSConv(features=6, kernel_size=3, use_bias=False)
    v = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(v, x)
    assert y.shape == (1, 8, 8, 6)
    kern = v['params']['kernel']
    std_k = (kern - kern.mean(axis=(0, 1, 2), keepdims=True)) / (
        kern.std(axis=(0, 1, 2), keepdims=True) + 1e-5)
    ref = jax.lax.conv_general_dilated(
        x, std_k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_k.mean(axis=(0, 1, 2))), 0.0,
                               atol=1e-6)
