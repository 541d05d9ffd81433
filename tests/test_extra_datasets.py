"""CrowdHuman/WIDERFace/Objects365/Cityscapes datasets + CrowdHuman metric.

Hand-computed MR/AP cases pin the Caltech protocol; odgt/XML parsers are
exercised on synthetic files.
"""
import json
import os
import numpy as np
import pytest

from erd_tpu.evaluation.crowdhuman_metric import (CrowdHumanMetric,
                                                  match_image)


def test_match_image_rules():
    gt = np.asarray([[0., 0., 10., 10.]])
    ignore = np.asarray([[100., 100., 120., 120.]])
    dets = np.asarray([
        [0., 0., 10., 10.],       # TP
        [1., 1., 11., 11.],       # duplicate -> FP
        [105., 105., 118., 118.],  # inside ignore -> dropped
        [50., 50., 60., 60.],     # FP
    ])
    scores = np.asarray([0.9, 0.8, 0.7, 0.6])
    s, f = match_image(dets, scores, gt, ignore)
    assert f.tolist() == [1, 0, 0]
    assert len(s) == 3


def test_crowdhuman_perfect_detection():
    m = CrowdHumanMetric()
    gt = np.asarray([[0., 0., 10., 10.], [20., 20., 40., 40.]])
    m.process(gt, np.asarray([0.9, 0.8]), gt)
    r = m.compute()
    assert r['AP'] == pytest.approx(1.0)
    assert r['MR'] == pytest.approx(1e-10, abs=1e-9)
    assert r['recall'] == 1.0


def test_crowdhuman_miss_rate_half():
    # 1 of 2 gts found, no FPs: miss rate .5 at every FPPI point
    m = CrowdHumanMetric()
    gt = np.asarray([[0., 0., 10., 10.], [20., 20., 40., 40.]])
    m.process(gt[:1], np.asarray([0.9]), gt)
    r = m.compute()
    assert r['MR'] == pytest.approx(0.5)
    assert r['AP'] == pytest.approx(0.5)


def test_crowdhuman_odgt_parsing(tmp_path):
    from erd_tpu.data.extra_datasets import CrowdHumanDataset
    lines = [
        json.dumps(dict(ID='img1', gtboxes=[
            dict(tag='person', fbox=[10, 10, 50, 100]),
            dict(tag='mask', fbox=[0, 0, 5, 5]),
            dict(tag='person', fbox=[2, 2, 8, 8],
                 extra=dict(ignore=1)),
        ])),
        json.dumps(dict(ID='img2', gtboxes=[])),
    ]
    p = tmp_path / 'ann.odgt'
    p.write_text('\n'.join(lines))
    sizes = tmp_path / 'sizes.json'
    sizes.write_text(json.dumps({'img1': [480, 640]}))
    ds = CrowdHumanDataset(str(p), img_prefix='/imgs',
                           extra_ann_file=str(sizes))
    assert len(ds) == 1  # empty img2 filtered
    rec = ds[0]
    assert rec.height == 480 and rec.width == 640
    np.testing.assert_allclose(rec.bboxes[0], [10, 10, 60, 110])
    assert rec.ignore.tolist() == [False, True, True]
    assert rec.path == '/imgs/img1.jpg'


def test_widerface_xml_parsing(tmp_path):
    from erd_tpu.data.extra_datasets import WIDERFaceDataset
    os.makedirs(tmp_path / 'Annotations')
    xml = """<annotation><folder>0--Parade</folder>
    <size><width>1024</width><height>768</height></size>
    <object><name>face</name>
      <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>60</xmax><ymax>90</ymax>
      </bndbox></object>
    </annotation>"""
    (tmp_path / 'Annotations' / 'img_1.xml').write_text(xml)
    (tmp_path / 'split.txt').write_text('img_1\n')
    ds = WIDERFaceDataset(str(tmp_path), 'split.txt', img_prefix='/w')
    rec = ds[0]
    assert rec.width == 1024 and rec.height == 768
    np.testing.assert_allclose(rec.bboxes, [[10, 20, 60, 90]])
    assert rec.path == '/w/0--Parade/img_1.jpg'


def test_objects365_derives_classes(tmp_path):
    from erd_tpu.data.extra_datasets import Objects365V1Dataset
    ann = dict(
        categories=[dict(id=3, name='zebra'), dict(id=1, name='apple')],
        images=[dict(id=1, file_name='x.jpg', width=100, height=100)],
        annotations=[dict(id=1, image_id=1, category_id=3,
                          bbox=[0, 0, 50, 50], area=2500, iscrowd=0)])
    p = tmp_path / 'o365.json'
    p.write_text(json.dumps(ann))
    ds = Objects365V1Dataset(str(p), filter_empty_gt=False, min_size=0)
    assert ds.classes == ('apple', 'zebra')  # category-id order
    assert ds[0].labels.tolist() == [1]     # zebra -> label 1


def test_cityscapes_metainfo():
    from erd_tpu.data.extra_datasets import CityscapesDataset
    assert CityscapesDataset.METAINFO['classes'][0] == 'person'
    assert len(CityscapesDataset.METAINFO['classes']) == 8
