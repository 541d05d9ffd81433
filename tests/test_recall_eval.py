"""eval_recalls, occluded/separated recall, get_classes, YOLOX L1 mode."""
import numpy as np


def test_eval_recalls_greedy_matching():
    from erd_tpu.evaluation import eval_recalls
    gts = [np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    # proposal 1 covers gt1 exactly; proposal 2 half-covers gt2
    props = [np.asarray([[0, 0, 10, 10, 0.9], [20, 20, 30, 25, 0.8]],
                        np.float32)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert r[0, 0] == 0.5     # top-1: only gt1 recalled
    assert r[1, 0] == 1.0     # half-cover IoU is exactly 0.5 -> >= thr
    r2 = eval_recalls(gts, props, proposal_nums=(2,), iou_thrs=(0.4, 0.95))
    assert r2[0, 0] == 1.0    # both clear 0.4
    assert r2[0, 1] == 0.5    # only the exact match clears 0.95
    # one-to-one: a single proposal cannot recall two gts
    dup = [np.asarray([[0, 0, 10, 10, 0.9]], np.float32)]
    gts2 = [np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)]
    r3 = eval_recalls(gts2, dup, proposal_nums=(1,), iou_thrs=(0.5,))
    assert r3[0, 0] == 0.5


def test_occluded_separated_recall():
    from erd_tpu.evaluation import occluded_separated_recall
    m = np.zeros((8, 8), bool)
    m[:4, :4] = True
    gt_ann = [(1, 'cat', m), (2, 'dog', m)]
    dets = {1: [(0.9, 'cat', m)],          # hit
            2: [(0.9, 'cat', m),           # wrong class
                (0.5, 'dog', ~m)]}         # right class, IoU 0
    recall, hits = occluded_separated_recall(dets, gt_ann)
    assert hits == 1 and recall == 50.0


def test_get_classes_registry():
    from erd_tpu.evaluation import get_classes
    assert get_classes('coco')[0] == 'person' and len(get_classes('coco')) == 80
    assert len(get_classes('voc')) == 20


def test_yolox_l1_mode_switch():
    """YOLOXModeSwitchHook enables the raw-parameterization L1 term."""
    import jax
    from erd_tpu.models.detectors.yolox import YOLOXDetector
    from tests.test_models import make_batch
    det = YOLOXDetector(num_classes=4)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_batch(h=64, w=96, gts=[([[10, 10, 60, 50]], [1]),
                                        ([[5, 5, 40, 40]], [0])])
    base = det.loss_jit(variables, batch)
    assert 'loss_l1_bbox' not in base

    class T:  # minimal trainer stub for the hook
        pass
    from erd_tpu.engine import YOLOXModeSwitchHook
    tr = T()
    tr.det = det
    tr.loader = T()
    hook = YOLOXModeSwitchHook(max_epochs=10, num_last_epochs=5)
    hook.before_epoch(tr, epoch=3)  # too early: epoch+1=4 < 5
    assert 'loss_l1_bbox' not in det.loss_jit(variables, batch)
    hook.before_epoch(tr, epoch=4)  # epoch+1 == 10-5 -> switch
    after = det.loss_jit(variables, batch)
    assert float(after['loss_l1_bbox']) > 0
    for k in base:
        np.testing.assert_allclose(float(after[k]), float(base[k]),
                                   rtol=1e-5)


def test_yolox_l1_switch_reaches_compiled_train_step():
    """Regression (round-2 advisor, high): the L1 flag is read at trace
    time inside Trainer's compiled step, so the hook must rebuild
    trainer._train_step — flipping the attribute alone is a no-op."""
    import jax
    from erd_tpu.data import DetDataLoader, LoaderConfig
    from erd_tpu.engine import (Hook, Trainer, TrainerConfig,
                                YOLOXModeSwitchHook)
    from erd_tpu.models.detectors.yolox import YOLOXDetector
    from erd_tpu.parallel import make_mesh
    from tests.test_engine import BlankPipe, SyntheticDataset

    det = YOLOXDetector(num_classes=3)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    ds = SyntheticDataset(n=8)
    loader = DetDataLoader(ds, BlankPipe(scale=(96, 64), max_gt=8),
                           LoaderConfig(batch_size=8, seed=0))
    per_epoch_keys = {}

    class KeyCapture(Hook):
        def after_iter(self, t, step, losses):
            per_epoch_keys.setdefault(t.epoch_now, set()).update(losses)

        def before_epoch(self, t, epoch):
            t.epoch_now = epoch

    # switch_epoch = 2 - 0 = 2? use max_epochs=2, num_last_epochs=1 ->
    # switch fires before epoch 1 (epoch+1 == 2 > 1? no: 0+1=1 >= 1)
    hook = YOLOXModeSwitchHook(max_epochs=3, num_last_epochs=1)
    tr = Trainer(det, loader,
                 TrainerConfig(epochs=2, base_lr=1e-3, warmup_iters=2,
                               milestones_epochs=(), frozen_stages=-1),
                 mesh=make_mesh(), hooks=[KeyCapture(), hook])
    tr.fit(variables)
    assert 'loss_l1_bbox' not in per_epoch_keys[0]
    assert 'loss_l1_bbox' in per_epoch_keys[1]


def test_coco_metric_proposal_fast_batch_path(tmp_path):
    """Regression (round-2 advisor, medium): proposal_fast AR must be
    populated through process_batch — the standard evaluation path —
    not only through the offline per-image path."""
    import json
    from erd_tpu.data import CocoDataset
    from erd_tpu.evaluation.coco_metric import CocoMetric
    from erd_tpu.structures import DetResults, ImageMeta
    ann = dict(
        images=[dict(id=1, file_name='a.jpg', width=100, height=100)],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                 area=100, iscrowd=0),
            dict(id=2, image_id=1, category_id=1, bbox=[50, 50, 20, 20],
                 area=400, iscrowd=0)],
        categories=[dict(id=1, name='person')])
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(ann))
    ds = CocoDataset(str(p), classes=('person',), test_mode=True)
    m = CocoMetric(ds, metrics='proposal_fast')
    dets = DetResults(
        bboxes=np.asarray([[[0., 0., 10., 10.], [80., 80., 99., 99.]]]),
        scores=np.asarray([[0.9, 0.8]]),
        labels=np.asarray([[0, 0]]),
        mask=np.asarray([[True, True]]))
    metas = ImageMeta(
        img_shape=np.asarray([[100., 100.]]),
        ori_shape=np.asarray([[100., 100.]]),
        scale_factor=np.asarray([[1., 1.]]),
        flip=np.asarray([False]),
        img_id=np.asarray([1], np.int32),
        valid=np.asarray([True]))
    m.process_batch(dets, metas)
    out = m.compute_metrics()
    assert out['AR@100'] == 0.5


def test_teacher_student_val_hook():
    from erd_tpu.engine import TeacherStudentValHook
    calls = []

    class T:
        teacher_variables = {'params': {}}
        val_fn = staticmethod(lambda v: calls.append(v) or {'mAP': 0.5})
    hook = TeacherStudentValHook(interval=2)
    hook.after_epoch(T(), epoch=0)   # epoch 1: not on interval
    assert calls == []
    hook.after_epoch(T(), epoch=1)   # epoch 2: teacher validated
    assert len(calls) == 1 and calls[0] == {'params': {}}


def test_coco_metric_proposal_fast(tmp_path):
    """metric='proposal_fast': class-agnostic AR over the recall grid."""
    import json
    from erd_tpu.data import CocoDataset
    from erd_tpu.evaluation.coco_metric import CocoMetric
    ann = dict(
        images=[dict(id=1, file_name='a.jpg', width=100, height=100)],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                 area=100, iscrowd=0),
            dict(id=2, image_id=1, category_id=1, bbox=[50, 50, 20, 20],
                 area=400, iscrowd=0)],
        categories=[dict(id=1, name='person')])
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(ann))
    ds = CocoDataset(str(p), classes=('person',), test_mode=True)
    m = CocoMetric(ds, metrics='proposal_fast')
    # one exact proposal + one miss: AR = mean over IoU grid of 1/2
    m.process_result(1, np.asarray([[0., 0., 10., 10.],
                                    [80., 80., 99., 99.]]),
                     np.asarray([0.9, 0.8]), np.asarray([0, 0]))
    out = m.compute_metrics()
    assert out['AR@100'] == 0.5
    assert out['AR@1000'] == 0.5


def test_coco_occluded_separated_metric_class(tmp_path):
    import pickle
    from erd_tpu.evaluation import CocoOccludedSeparatedMetric
    m = np.zeros((8, 8), bool)
    m[:4, :4] = True
    for name, ann in (('occ.pkl', [(1, 'cat', m)]),
                      ('sep.pkl', [(1, 'cat', m), (2, 'cat', m)])):
        with open(tmp_path / name, 'wb') as f:
            pickle.dump(ann, f)
    metric = CocoOccludedSeparatedMetric(str(tmp_path / 'occ.pkl'),
                                         str(tmp_path / 'sep.pkl'))
    metric.process_result(1, [0.9], ['cat'], [m])
    out = metric.compute_metrics()
    assert out['occluded_recall'] == 100.0
    assert out['separated_recall'] == 50.0
