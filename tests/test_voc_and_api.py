"""VOC dataset/metric tests + inference API smoke (uses the reference's demo
image read-only when present)."""
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from erd_tpu.data import VOCDataset
from erd_tpu.evaluation import VOCMetric, average_precision
from erd_tpu.evaluation.coco_eval import DetectionResult
from erd_tpu.data.coco import ImageRecord


def write_voc(tmp_path, img_id, objs, w=640, h=480):
    ann_dir = tmp_path / 'Annotations'
    set_dir = tmp_path / 'ImageSets' / 'Main'
    ann_dir.mkdir(exist_ok=True)
    set_dir.mkdir(parents=True, exist_ok=True)
    root = ET.Element('annotation')
    size = ET.SubElement(root, 'size')
    ET.SubElement(size, 'width').text = str(w)
    ET.SubElement(size, 'height').text = str(h)
    for name, box, diff in objs:
        o = ET.SubElement(root, 'object')
        ET.SubElement(o, 'name').text = name
        ET.SubElement(o, 'difficult').text = str(diff)
        bb = ET.SubElement(o, 'bndbox')
        for k, v in zip(('xmin', 'ymin', 'xmax', 'ymax'), box):
            ET.SubElement(bb, k).text = str(v)
    ET.ElementTree(root).write(ann_dir / f'{img_id}.xml')
    with open(set_dir / 'trainval.txt', 'a') as f:
        f.write(img_id + '\n')


def test_voc_dataset(tmp_path):
    write_voc(tmp_path, '000001',
              [('dog', (49, 12, 99, 100), 0),
               ('person', (100, 100, 200, 300), 1)])
    ds = VOCDataset(str(tmp_path))
    assert len(ds) == 1
    r = ds[0]
    assert r.labels.tolist() == [11, 14]  # dog, person in VOC order
    np.testing.assert_allclose(r.bboxes[0], [48, 11, 98, 99])
    assert r.ignore.tolist() == [False, True]


def test_average_precision_modes():
    recalls = np.asarray([0.5, 1.0])
    precisions = np.asarray([1.0, 0.5])
    assert average_precision(recalls, precisions, 'area') == \
        pytest.approx(0.75)
    ap11 = average_precision(recalls, precisions, '11points')
    assert 0.7 < ap11 <= 0.8


def test_voc_metric_perfect():
    gt = [ImageRecord(1, '', 100, 100,
                      np.asarray([[10., 10., 50., 50.]], np.float32),
                      np.asarray([0], np.int32), np.zeros(1, bool))]
    m = VOCMetric(gt, num_classes=2, class_names=['a', 'b'])
    m.process(DetectionResult(1, np.asarray([[10., 10., 50., 50.]]),
                              np.asarray([0.9]), np.asarray([0])))
    out = m.compute_metrics()
    assert out['mAP'] == pytest.approx(1.0)
    assert out['AP_a'] == pytest.approx(1.0)


def test_voc_difficult_ignored():
    gt = [ImageRecord(1, '', 100, 100,
                      np.asarray([[10., 10., 50., 50.]], np.float32),
                      np.asarray([0], np.int32), np.ones(1, bool))]
    m = VOCMetric(gt, num_classes=1, mode='area')
    m.process(DetectionResult(1, np.asarray([[10., 10., 50., 50.]]),
                              np.asarray([0.9]), np.asarray([0])))
    out = m.compute_metrics()
    assert out['mAP'] == 0.0  # no countable gt -> no AP rows


DEMO = '/root/reference/demo/demo.jpg'


@pytest.mark.skipif(not os.path.exists(DEMO), reason='demo image absent')
def test_real_image_inference_smoke():
    """Full real-image path: decode -> resize -> bucket -> jitted predict."""
    import jax
    from erd_tpu.apis import inference_detector
    from erd_tpu.models import GFLDetector
    det = GFLDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0))
    res = inference_detector(det, variables, DEMO)
    assert res.bboxes.shape[1] == 4
    # random weights: whatever is detected must lie inside the image
    from erd_tpu.data.transforms import imread_rgb
    h, w = imread_rgb(DEMO).shape[:2]
    if len(res.bboxes):
        assert res.bboxes[:, 2].max() <= w + 1
        assert res.bboxes[:, 3].max() <= h + 1
