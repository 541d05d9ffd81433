"""The trainer derives ERD's DDP-equivalence scale from its mesh.

Round-3 VERDICT weak #8: ``ERDConfig.num_devices`` was a build-time
constant (gfl_erd.py applies ``dist_loss_weight / num_devices`` to the
per-image distill-loss sums, mirroring the objective DDP gradient
averaging over ranks in the reference,
mmdet/models/dense_heads/gfl_head_increment_erd.py:411-447 summed
per-rank then all-reduce-averaged). Any entry point that built the
detector with the default 1 and trained on an N-device mesh silently
overweighted the distill terms N-fold. The Trainer now rebuilds the
config from the mesh width, so the footgun is structurally impossible.
"""
import dataclasses

import jax
import numpy as np
import pytest

from erd_tpu.data import DetDataLoader, LoaderConfig
from erd_tpu.engine import Hook, Trainer, TrainerConfig
from erd_tpu.models import ERDConfig, ERDDetector
from erd_tpu.parallel import make_mesh

from tests.test_engine import BlankPipe, SyntheticDataset


def _make_trainer(det, mesh, teacher):
    loader = DetDataLoader(SyntheticDataset(),
                           BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    cfg = TrainerConfig(epochs=1, base_lr=0.02, warmup_iters=2,
                        milestones_epochs=(), frozen_stages=-1,
                        ckpt_dir=None)
    return Trainer(det, loader, cfg, teacher_variables=teacher, mesh=mesh)


def test_trainer_derives_num_devices_from_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh(jax.devices()[:8])

    # Built with the WRONG (default) width on purpose.
    det1 = ERDDetector(num_classes=6, depth=18,
                       erd=ERDConfig(ori_num_classes=3,
                                     ers_reg_cap=32, num_devices=1))
    teacher = det1.teacher.init(jax.random.PRNGKey(1), image_shape=(64, 96))
    student = det1.init_student_from_teacher(
        jax.random.PRNGKey(2), teacher, image_shape=(64, 96))

    tr = _make_trainer(det1, mesh, teacher)
    assert tr.det.erd.num_devices == 8  # derived, not the build-time 1

    # And the correction matters: a mis-scaled loss call differs by 8x on
    # the distill terms.
    batch = next(iter(tr.loader.epoch(0)))
    wrong = det1.loss(student, batch, teacher_variables=teacher)
    right = tr.det.loss(student, batch, teacher_variables=teacher)
    np.testing.assert_allclose(float(wrong['loss_dist_cls']),
                               8 * float(right['loss_dist_cls']), rtol=1e-5)
    np.testing.assert_allclose(float(wrong['loss_dist_bbox']),
                               8 * float(right['loss_dist_bbox']), rtol=1e-5)


@pytest.mark.slow
def test_one_device_built_matches_correctly_built_on_mesh():
    """VERDICT item 8's acceptance test: a detector built with
    num_devices=1 trained on an 8-device mesh yields the same losses as
    one built with the correct width."""
    assert jax.device_count() == 8
    mesh = make_mesh(jax.devices()[:8])

    losses_by_build = {}
    for built_width in (1, 8):
        det = ERDDetector(num_classes=6, depth=18,
                          erd=ERDConfig(ori_num_classes=3,
                                        ers_reg_cap=32,
                                        num_devices=built_width))
        teacher = det.teacher.init(jax.random.PRNGKey(1),
                                   image_shape=(64, 96))
        student = det.init_student_from_teacher(
            jax.random.PRNGKey(2), teacher, image_shape=(64, 96))

        tr = _make_trainer(det, mesh, teacher)
        seen = []

        class Cap(Hook):
            def after_iter(self, t, step, losses):
                seen.append(dict(losses))

        tr.hooks = [Cap()]
        tr.fit(student)
        losses_by_build[built_width] = seen

    for a, b in zip(losses_by_build[1], losses_by_build[8]):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)
