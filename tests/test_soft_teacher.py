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


def test_semi_trainer_e2e():
    """SemiTrainer: SoftTeacher + SemiDataLoader, EMA teacher on device.

    Covers the reference MeanTeacherHook + semi_base.py loop: teacher
    starts as the student, trails it by EMA, and the returned
    student/teacher trees differ from init and from each other.
    """
    from erd_tpu.data import DetDataLoader, LoaderConfig
    from erd_tpu.data.loader import SemiDataLoader
    from erd_tpu.engine.train_loop import SemiTrainer, TrainerConfig
    from erd_tpu.models.detectors.soft_teacher import (SemiTrainConfig,
                                                       SoftTeacherDetector)
    from erd_tpu.parallel import make_mesh
    from tests.test_engine import BlankPipe, SyntheticDataset

    det = SoftTeacherDetector(
        num_classes=3, depth=18,
        semi=SemiTrainConfig(max_pseudo=8, jitter_times=2,
                             pseudo_label_initial_score_thr=0.0))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))

    sup_loader = DetDataLoader(
        SyntheticDataset(n=8), BlankPipe(scale=(96, 64), max_gt=8),
        LoaderConfig(batch_size=8, seed=0))
    semi_loader = SemiDataLoader(
        sup_loader, SyntheticDataset(n=8),
        BlankPipe(scale=(96, 64), max_gt=8),
        strong_photometric=lambda img, rs: np.clip(
            img.astype(np.int16) + rs.randint(-20, 20, img.shape),
            0, 255).astype(np.uint8),
        seed=0)

    cfg = TrainerConfig(epochs=1, base_lr=0.01, warmup_iters=2,
                        milestones_epochs=(), log_interval=1,
                        frozen_stages=-1)
    tr = SemiTrainer(det, semi_loader, cfg, ema_momentum=0.9,
                     mesh=make_mesh())
    seen = []

    from erd_tpu.engine import Hook

    class Capture(Hook):
        def after_iter(self, t, step, losses):
            seen.append(losses)

    tr.hooks = [Capture()]
    out = tr.fit(variables)
    assert len(seen) == semi_loader.steps_per_epoch(0)
    for losses in seen:
        assert {'sup_loss_cls', 'unsup_loss_cls'} <= set(losses)
        assert all(np.isfinite(v) for v in losses.values()), losses

    def tree_delta(a, b):
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    student = out['student']['params']
    teacher = out['teacher']['params']
    assert tree_delta(student, variables['params']) > 0
    assert tree_delta(teacher, variables['params']) > 0   # EMA moved
    assert tree_delta(teacher, student) > 0               # but trails


def test_ema_teacher_update_integrates():
    from erd_tpu.engine import ema_update
    s = {'w': jnp.ones((3,))}
    t = {'w': jnp.zeros((3,))}
    t2 = ema_update(t, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(t2['w']), 0.1, rtol=1e-6)
