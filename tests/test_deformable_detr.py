"""Deformable DETR tests: deformable sampling numerics + detector modes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.ops.ms_deform_attn import ms_deform_attn_sample
from tests.test_models import make_batch


def test_ms_deform_sample_constant_field():
    """Sampling a constant map returns the constant for interior locations
    (zero-padding semantics make border samples decay, as in grid_sample)."""
    rs = np.random.RandomState(0)
    levels = [jnp.full((8, 12, 2, 4), 3.0), jnp.full((4, 6, 2, 4), 3.0)]
    q, heads, L, K = 5, 2, 2, 3
    locs = jnp.asarray(
        (0.2 + 0.6 * rs.rand(q, heads, L, K, 2)).astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rs.randn(q, heads, L * K).astype(np.float32)), -1).reshape(
        q, heads, L, K)
    out = ms_deform_attn_sample(levels, locs, w)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_ms_deform_sample_zero_padding_at_border():
    """grid_sample(padding_mode='zeros') semantics: a sample centered on the
    image edge averages the in-range texel with zeros, halving the value."""
    v = jnp.full((8, 8, 1, 1), 2.0)
    # x = 0 normalized -> pixel coord -0.5: corners x=-1 (zero) and x=0
    loc = jnp.asarray([[[[[0.0, (3 + 0.5) / 8]]]]])  # (1,1,1,1,2)
    w = jnp.ones((1, 1, 1, 1))
    out = ms_deform_attn_sample([v], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 1.0, atol=1e-5)


def test_ms_deform_sample_reads_location():
    """Point weights at a single location read the bilinear value there."""
    v = jnp.zeros((10, 10, 1, 1)).at[4, 6, 0, 0].set(1.0)
    # sample exactly at cell center of (y=4, x=6): normalized (x+0.5)/W
    loc = jnp.asarray([[[[[(6 + 0.5) / 10, (4 + 0.5) / 10]]]]])  # (1,1,1,1,2)
    w = jnp.ones((1, 1, 1, 1))
    out = ms_deform_attn_sample([v], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 1.0, atol=1e-5)


@pytest.fixture(scope='module')
def ddetr():
    from erd_tpu.models.detectors.deformable_detr import \
        DeformableDETRDetector
    det = DeformableDETRDetector(num_classes=4, depth=18, num_queries=20)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_ddetr_loss(ddetr):
    det, variables = ddetr
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    assert len(losses) == 18  # 6 layers x 3 terms
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_ddetr_grads(ddetr):
    det, variables = ddetr
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p, **consts}, batch).values())

    grads = jax.grad(total)(params)
    g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0
    # deformable sampling offsets receive gradient
    enc0 = grads['bbox_head']['encoder_0']['self_attn']
    assert float(jnp.abs(enc0['sampling_offsets']['bias']).sum()) >= 0
    assert float(jnp.abs(jax.tree.leaves(enc0)[0]).sum()) >= 0


def test_ddetr_predict(ddetr):
    det, variables = ddetr
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape[0] == 2
    b = np.asarray(res.bboxes)
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
