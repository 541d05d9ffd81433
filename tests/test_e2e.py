"""End-to-end slice: train -> checkpoint -> eval -> incremental stage chain,
all on the 8-device CPU mesh with synthetic data (plumbing-level assertions;
mAP quality needs real data/compute and is covered by benchmarks)."""
import numpy as np
import jax
import pytest

from erd_tpu.data import DetDataLoader, LoaderConfig
from erd_tpu.engine import (Trainer, TrainerConfig, latest_checkpoint,
                            run_evaluation)
from erd_tpu.evaluation import CocoMetric
from erd_tpu.models import ERDConfig, ERDDetector, GFLDetector
from erd_tpu.parallel import make_mesh
from tests.test_engine import BlankPipe, SyntheticDataset


class FakeCocoDataset(SyntheticDataset):
    """Adds the CocoMetric-facing surface to the synthetic dataset."""
    num_classes = 3
    label_names = ['a', 'b', 'c']
    cat_ids = [1, 2, 3]


def test_train_ckpt_eval_chain(tmp_path):
    mesh = make_mesh()
    det = GFLDetector(num_classes=3, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    ds = FakeCocoDataset(n=16)
    loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    cfg = TrainerConfig(epochs=1, base_lr=0.005, warmup_iters=2,
                        milestones_epochs=(), frozen_stages=-1,
                        ckpt_dir=str(tmp_path / 'ckpt'))
    tr = Trainer(det, loader, cfg, mesh=mesh, hooks=[])
    out = tr.fit(variables)

    # checkpoint written and restorable
    path = latest_checkpoint(str(tmp_path / 'ckpt'))
    assert path is not None

    # eval runs end-to-end and yields the full metric set
    val_loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8,
                                             training=False),
                               LoaderConfig(batch_size=8, seed=0,
                                            drop_last=False, shuffle=False))
    metric = CocoMetric(ds, classwise=True)
    metrics = run_evaluation(det, out, val_loader, metric)
    for k in ('bbox_mAP', 'bbox_mAP_50', 'bbox_mAP_s', 'bbox_AR_100'):
        assert k in metrics
    assert 'classwise' in metrics

    # resume path: trainer restores step from checkpoint
    tr2 = Trainer(det, loader,
                  TrainerConfig(epochs=1, warmup_iters=2,
                                milestones_epochs=(), frozen_stages=-1,
                                ckpt_dir=str(tmp_path / 'ckpt')),
                  mesh=mesh, hooks=[])
    out2 = tr2.fit(variables, resume=True)  # already at final step: no iters
    assert out2 is not None


def test_incremental_stage_chain(tmp_path):
    """Stage 1 teacher -> widen -> ERD stage 2 with distillation trains."""
    mesh = make_mesh()
    teacher_det = GFLDetector(num_classes=2, depth=18)
    teacher_vars = teacher_det.init(jax.random.PRNGKey(0),
                                    image_shape=(64, 96))

    erd = ERDDetector(num_classes=3, depth=18,
                      erd=ERDConfig(ori_num_classes=2,
                                    ers_reg_cap=32, num_devices=8))
    student_vars = erd.init_student_from_teacher(jax.random.PRNGKey(1),
                                                 teacher_vars)

    ds = FakeCocoDataset(n=16)
    # new-task dataset labels are 0-based over the single new class
    for r in ds.records:
        r.labels[:] = 0
    loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    cfg = TrainerConfig(epochs=1, base_lr=0.002, warmup_iters=2,
                        milestones_epochs=(), frozen_stages=1)
    tr = Trainer(erd, loader, cfg, teacher_variables=teacher_vars,
                 mesh=mesh, hooks=[])
    out = tr.fit(student_vars)
    assert out is not None
    # eval the incremental student over ALL classes
    val_loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8,
                                             training=False),
                               LoaderConfig(batch_size=8, seed=0,
                                            drop_last=False, shuffle=False))
    metric = CocoMetric(ds, classwise=False)
    metrics = run_evaluation(erd, out, val_loader, metric)
    assert 'bbox_mAP' in metrics
