"""PanopticFPN + fusion + PQ metric tests.

Pins: the PQ protocol on hand-computable maps (exact PQ/SQ/RQ numbers),
the heuristic fusion rules (score order, overlap drop, stuff area limit),
the panoptic dataset parsing (segments_info -> things/stuff), and the
PanopticFPN detector loss/predict contract on a tiny model.
"""
import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.evaluation.panoptic_metric import (INSTANCE_OFFSET,
                                                PanopticMetric)
from erd_tpu.models.detectors.panoptic_fpn import heuristic_fuse

NT, NS = 3, 2           # toy: 3 thing classes, 2 stuff classes
VOID = NT + NS


def _map(h=10, w=10):
    return np.full((h, w), VOID, np.int64)


def test_pq_perfect_match():
    gt = _map()
    gt[:5, :5] = 0 + INSTANCE_OFFSET * 1          # thing cls 0
    gt[5:, :] = NT + 1                            # stuff cls 1
    m = PanopticMetric(NT, NS)
    m.process(gt.copy(), gt)
    r = m.compute()
    assert r['PQ'] == pytest.approx(1.0)
    assert r['SQ'] == pytest.approx(1.0)
    assert r['RQ'] == pytest.approx(1.0)


def test_pq_partial_iou():
    gt = _map()
    gt[0:4, 0:10] = 0 + INSTANCE_OFFSET * 1       # 40 px thing
    pred = _map()
    pred[1:4, 0:10] = 0 + INSTANCE_OFFSET * 7     # 30 px, IoU 30/40 = .75
    m = PanopticMetric(NT, NS)
    m.process(pred, gt)
    r = m.compute()
    # one TP with IoU .75: PQ = .75, SQ = .75, RQ = 1
    assert r['PQ'] == pytest.approx(0.75)
    assert r['SQ'] == pytest.approx(0.75)
    assert r['RQ'] == pytest.approx(1.0)


def test_pq_fp_fn_counting():
    gt = _map()
    gt[:5, :5] = 1 + INSTANCE_OFFSET * 1
    pred = _map()
    pred[:5, 5:] = 1 + INSTANCE_OFFSET * 1        # disjoint -> FP + FN
    m = PanopticMetric(NT, NS)
    m.process(pred, gt)
    r = m.compute()
    # tp=0 fp=1 fn=1 -> PQ = 0
    assert r['PQ'] == pytest.approx(0.0)
    cls = r['classwise'][1]
    assert cls['RQ'] == 0.0


def test_pq_void_rule():
    gt = _map()  # all void
    pred = _map()
    pred[:6, :6] = 2 + INSTANCE_OFFSET * 1        # lies fully in gt void
    m = PanopticMetric(NT, NS)
    m.process(pred, gt)
    r = m.compute()
    # prediction over void is not an FP; nothing to score
    assert r['PQ'] == pytest.approx(0.0)
    assert r['classwise'] == {}


def test_heuristic_fuse_rules():
    h = w = 16
    masks = np.zeros((3, h, w), np.float32)
    masks[0, :8, :8] = 1.0            # best-scoring instance
    masks[1, :8, :8] = 1.0            # duplicate of 0 -> dropped (overlap)
    masks[2, 8:, 8:] = 1.0            # separate instance
    sem = np.zeros((h, w, NS + 1), np.float32)
    sem[..., 0] = 0.1                 # stuff class 0 weak everywhere
    sem[8:, :8, 1] = 5.0              # stuff 1 strong in bottom-left 8x8=64px
    pan = heuristic_fuse(
        det_boxes=np.zeros((3, 4)), det_labels=np.asarray([0, 0, 1]),
        det_scores=np.asarray([0.9, 0.8, 0.7]),
        det_valid=np.asarray([True, True, True]),
        pasted_masks=masks, sem_logits_up=sem,
        num_things_classes=NT, num_stuff_classes=NS,
        stuff_area_limit=50)
    assert (pan[:8, :8] == 0 + INSTANCE_OFFSET * 1).all()
    assert (pan[8:, 8:] == 1 + INSTANCE_OFFSET * 2).all()
    # stuff 1 region (64 px >= 50) filled; stuff 0 (rest, 64 px) also >= 50
    assert (pan[8:, :8] == NT + 1).all()
    assert (pan[:8, 8:] == NT + 0).all()


def test_heuristic_fuse_stuff_area_limit():
    h = w = 8
    sem = np.zeros((h, w, NS + 1), np.float32)
    sem[:2, :2, 1] = 5.0              # only 4 px of stuff 1
    pan = heuristic_fuse(
        det_boxes=np.zeros((0, 4)), det_labels=np.zeros(0, int),
        det_scores=np.zeros(0), det_valid=np.zeros(0, bool),
        pasted_masks=np.zeros((0, h, w)), sem_logits_up=sem,
        num_things_classes=NT, num_stuff_classes=NS,
        stuff_area_limit=16)
    assert (pan[:2, :2] == VOID).all()  # too small -> void


def test_panoptic_dataset_parsing(tmp_path):
    from erd_tpu.data.coco_panoptic import (CocoPanopticDataset,
                                            decode_panoptic_png)
    ann = dict(
        categories=[
            dict(id=1, name='person', isthing=1),
            dict(id=92, name='banner', isthing=0),
        ],
        images=[dict(id=7, file_name='a.jpg', width=20, height=10)],
        annotations=[dict(
            image_id=7, file_name='a.png',
            segments_info=[
                dict(id=5, category_id=1, bbox=[2, 2, 6, 4], iscrowd=0,
                     area=24),
                dict(id=9, category_id=92, bbox=[0, 0, 20, 10],
                     iscrowd=0, area=100),
            ])])
    p = tmp_path / 'pan.json'
    p.write_text(json.dumps(ann))
    ds = CocoPanopticDataset(str(p), min_size=0)
    assert len(ds) == 1
    rec = ds[0]
    np.testing.assert_allclose(rec.bboxes, [[2, 2, 8, 6]])
    assert rec.labels.tolist() == [0]
    assert rec.segment_ids.tolist() == [5]
    assert rec.stuff_segments == [dict(id=9, label=0)]

    ids = np.zeros((10, 20), np.int32)
    ids[2:6, 2:8] = 5
    ids[8:, :] = 9
    sem = ds.semantic_map(rec, ids)
    assert (sem[2:6, 2:8] == 53).all()      # thing pixels -> S
    assert (sem[8:, :] == 0).all()          # banner -> stuff label 0
    assert (sem[0, 0] == 255)
    gt_pan = ds.gt_panoptic(rec, ids)
    assert (gt_pan[2:6, 2:8] == 0 + INSTANCE_OFFSET).all()
    assert (gt_pan[8:, :] == 80 + 0).all()

    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[0, 0] = (5, 1, 2)  # 5 + 256 + 2*65536
    assert decode_panoptic_png(rgb)[0, 0] == 5 + 256 + 2 * 65536


def _mask_batch(h=64, w=96, max_gt=8):
    from erd_tpu.structures import GTInstances, ImageMeta
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (2, h, w, 3), dtype=np.uint8)
    crop = np.ones((56, 56), np.uint8)
    gts = [GTInstances.pad(np.asarray([[10., 10., 60., 50.]], np.float32),
                           np.asarray([1], np.int32), max_gt,
                           masks=[crop]),
           GTInstances.pad(np.zeros((0, 4), np.float32),
                           np.zeros(0, np.int32), max_gt,
                           masks=[])]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs), *gts)
    metas = [ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=i)
             for i in range(2)]
    meta = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
    return dict(images=jnp.asarray(images), gt=gt, meta=meta)


def test_panoptic_fpn_loss_and_predict():
    from erd_tpu.models.detectors.panoptic_fpn import PanopticFPNDetector
    det = PanopticFPNDetector(num_classes=4, depth=18,
                              num_stuff_classes=NS)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = _mask_batch()
    sem = np.full((2, 64, 96), 255, np.uint8)
    sem[0, :32] = 0
    sem[0, 32:] = NS  # things region
    batch['sem_seg'] = jnp.asarray(sem)
    losses = det.loss_jit(variables, batch)
    assert float(losses['loss_semantic']) > 0
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    detr, masks, sem_logits = det.predict_jit(variables, batch)
    assert sem_logits.shape == (2, 16, 24, NS + 1)
    assert masks.shape[:2] == detr.bboxes.shape[:2]
