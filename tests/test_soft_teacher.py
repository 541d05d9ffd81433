"""SoftTeacher semi-supervised framework invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_models import make_batch


@pytest.fixture(scope='module')
def soft_teacher():
    from erd_tpu.models.detectors.soft_teacher import (SemiTrainConfig,
                                                       SoftTeacherDetector)
    det = SoftTeacherDetector(
        num_classes=4, depth=18,
        semi=SemiTrainConfig(max_pseudo=8, jitter_times=4,
                             pseudo_label_initial_score_thr=0.0))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    return det, variables


def test_semi_loss_structure(soft_teacher):
    det, variables = soft_teacher
    sup = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    weak = make_batch()
    strong = make_batch()
    teacher = jax.tree.map(lambda x: x, variables)  # EMA copy at init
    losses = det.semi_loss_jit(variables, sup, weak, strong,
                               teacher_variables=teacher)
    keys = set(losses)
    assert {'sup_loss_cls', 'sup_loss_bbox', 'sup_loss_rpn_cls',
            'unsup_loss_cls', 'unsup_loss_bbox', 'unsup_loss_rpn_cls',
            'unsup_loss_rpn_bbox'} <= keys
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)


def test_unsup_grads_flow_to_student_only(soft_teacher):
    det, variables = soft_teacher
    sup = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    weak = make_batch()
    strong = make_batch()
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}
    teacher = jax.tree.map(lambda x: x, variables)

    @jax.jit
    def total(p):
        losses = det.semi_loss({'params': p, **consts}, sup, weak, strong,
                               teacher_variables=teacher)
        return sum(losses.values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ema_teacher_update_integrates():
    from erd_tpu.engine import ema_update
    s = {'w': jnp.ones((3,))}
    t = {'w': jnp.zeros((3,))}
    t2 = ema_update(t, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(t2['w']), 0.1, rtol=1e-6)
