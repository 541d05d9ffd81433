"""PAA: masked EM oracle vs sklearn-style numpy EM + assignment/loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models import make_batch


def test_masked_gmm_separates_bimodal():
    from erd_tpu.models.heads.paa_head import _masked_gmm_em
    rs = np.random.RandomState(0)
    lo = rs.normal(0.5, 0.05, 20)
    hi = rs.normal(3.0, 0.1, 25)
    x = np.concatenate([lo, hi, np.zeros(15)]).astype(np.float32)
    mask = np.concatenate([np.ones(45, bool), np.zeros(15, bool)])
    resp0, loglik = _masked_gmm_em(jnp.asarray(x)[:, None],
                                   jnp.asarray(mask)[:, None], iters=20)
    r = np.asarray(resp0[:, 0])
    assert (r[:20] > 0.9).all()    # low-loss cluster -> component 0
    assert (r[20:45] < 0.1).all()  # high-loss cluster -> component 1
    assert np.isfinite(np.asarray(loglik)[mask].mean())


def test_paa_assign_prefers_low_loss_candidates():
    from erd_tpu.models.heads.gfl_head import AnchorContext
    from erd_tpu.models.heads.paa_head import paa_assign
    from erd_tpu.task.anchors import AnchorGenerator
    ctx = AnchorContext.build((64, 96), AnchorGenerator())
    n = ctx.anchors.shape[0]
    rs = np.random.RandomState(0)
    gt_b = jnp.asarray([[10, 10, 60, 50], [0, 0, 0, 0]], jnp.float32)
    gt_l = jnp.asarray([1, 0], jnp.int32)
    gt_m = jnp.asarray([True, False])
    cls = jnp.asarray(rs.normal(-4, 0.5, (n, 4)).astype(np.float32))
    # decoded boxes: anchors themselves (so anchors overlapping gt have
    # low GIoU loss)
    decoded = jnp.asarray(ctx.anchors)
    pos, gt_idx = paa_assign(ctx, cls, decoded, gt_b, gt_l, gt_m, 4)
    pos = np.asarray(pos)
    assert pos.sum() > 0
    # all positives must be first-matched to the valid gt
    assert (np.asarray(gt_idx)[pos] == 0).all()
    # positives' anchors must overlap the gt
    from erd_tpu.structures.boxes import bbox_overlaps
    ious = np.asarray(bbox_overlaps(jnp.asarray(ctx.anchors), gt_b))[:, 0]
    assert (ious[pos] >= 0.1).all()


@pytest.fixture(scope='module')
def paa():
    from erd_tpu.models.detectors.paa import PAADetector
    det = PAADetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_loss_modes(paa):
    det, variables = paa
    losses = det.loss_jit(variables, make_batch())
    assert float(losses['loss_bbox']) == 0
    assert float(losses['loss_iou']) == 0
    assert float(losses['loss_cls']) > 0
    gts = [([[10, 10, 60, 50]], [1]), ([[5, 5, 40, 40]], [0])]
    losses = det.loss_jit(variables, make_batch(gts=gts))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses['loss_bbox']) > 0
    assert float(losses['loss_iou']) > 0


def test_grads_flow(paa):
    det, variables = paa
    gts = [([[10, 10, 60, 50]], [1]), ([], [])]
    batch = make_batch(gts=gts)
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}

    @jax.jit
    def total(p):
        return sum(det.loss({'params': p, **consts}, batch).values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_predict_contract(paa):
    det, variables = paa
    res = det.predict_jit(variables, make_batch())
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool


def test_lad_uses_teacher_assignment():
    """LAD: the teacher's PAA split drives the student losses
    (lad_head.py)."""
    import jax
    import numpy as np
    from erd_tpu.models.detectors.lad import LADDetector
    from tests.test_models import make_batch
    det = LADDetector(num_classes=4, depth=18)
    sv = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    tv = det.teacher.init(jax.random.PRNGKey(1), image_shape=(64, 96))
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    losses = det.loss_jit(sv, batch, tv)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    assert float(losses['loss_bbox']) > 0
    # a different teacher changes the assignment -> different loss
    tv2 = det.teacher.init(jax.random.PRNGKey(7), image_shape=(64, 96))
    losses2 = det.loss_jit(sv, batch, tv2)
    assert float(losses2['loss_cls']) != float(losses['loss_cls'])
