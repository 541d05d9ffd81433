"""DINO: mixed query selection, box-refining decoder, CDN denoising."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.structures import GTInstances, ImageMeta


MAX_GT = 6


def make_batch(b=2, h=64, w=96):
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, h, w, 3), dtype=np.uint8)
    gts, metas = [], []
    for i in range(b):
        boxes = np.asarray([[10.0, 10.0, 60.0, 50.0],
                            [30.0, 20.0, 80.0, 60.0]], np.float32)
        gts.append(GTInstances.pad(boxes, np.asarray([i % 3, 1], np.int32),
                                   MAX_GT))
        metas.append(ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=i))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs), *gts)
    meta = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
    return dict(images=jnp.asarray(images), gt=gt, meta=meta)


@pytest.fixture(scope='module')
def dino():
    from erd_tpu.models.detectors.dino import DINODetector
    det = DINODetector(num_classes=4, depth=18, num_queries=20)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96),
                         max_gt=MAX_GT)
    return det, variables


def test_dn_queries_layout():
    from erd_tpu.models.heads.dino_head import make_dn_queries
    rng = jax.random.PRNGKey(0)
    g = 4
    boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2]] * g], jnp.float32)
    labels = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    mask = jnp.asarray([[True, True, False, False]])
    dl, db, dv = make_dn_queries(rng, boxes, labels, mask, 4, dn_groups=2)
    assert dl.shape == (1, 16) and db.shape == (1, 16, 4)
    assert dv.shape == (1, 16)
    # validity mirrors the gt mask in every group half
    np.testing.assert_array_equal(
        np.asarray(dv[0]), np.tile([True, True, False, False], 4))
    assert float(db.min()) >= 0 and float(db.max()) <= 1


def test_dn_attn_mask_blocks():
    from erd_tpu.models.heads.dino_head import make_dn_attn_mask
    m = np.asarray(make_dn_attn_mask(8, 5, dn_groups=2))
    # matching queries (last 5) cannot see dn part
    assert not m[8:, :8].any()
    # group 0 cannot see group 1 and vice versa
    assert not m[0:4, 4:8].any()
    assert not m[4:8, 0:4].any()
    # groups see themselves; everyone sees the matching part they may
    assert m[0:4, 0:4].all() and m[8:, 8:].all()


def test_dino_loss_keys_and_finite(dino):
    det, variables = dino
    losses = det.loss_jit(variables, make_batch())
    # 6 decoder layers x (matching + dn) + enc aux
    assert 'loss_cls' in losses and 'loss_dn_cls' in losses
    assert 'loss_enc_cls' in losses and 'loss_cls_aux0' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_cls']) > 0
    assert float(losses['loss_dn_cls']) > 0


def test_dino_predict_shapes(dino):
    det, variables = dino
    res = det.predict_jit(variables, make_batch())
    k = min(det.max_per_img, det.num_queries * det.num_classes)
    assert res.bboxes.shape == (2, k, 4)
    b = np.asarray(res.bboxes)
    assert np.isfinite(b).all()
    assert (b[..., 2:] >= b[..., :2] - 1e-3).all()


def test_dino_gradients_reach_encoder_and_dn_embed(dino):
    det, variables = dino
    batch = make_batch()
    params = variables['params']

    consts = {k: v for k, v in variables.items() if k != 'params'}
    grads = jax.jit(jax.grad(lambda p: sum(jax.tree.leaves(
        det.loss({'params': p, **consts}, batch)))))(params)
    head = grads['bbox_head']
    for key in ('enc_cls', 'dn_label_embed', 'query_embed', 'fc_cls',
                'decoder_0', 'encoder_0'):
        gsum = sum(float(jnp.abs(x).sum())
                   for x in jax.tree.leaves(head[key]))
        assert gsum > 0, key
