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


def test_openimages_metric_protocol():
    from erd_tpu.evaluation.openimages_metric import OpenImagesMetric
    # hierarchy: class 1 is a child of class 0
    rel = np.eye(3, dtype=bool)
    rel[1, 0] = True
    m = OpenImagesMetric(num_classes=3, relation_matrix=rel)
    gt = np.asarray([[0., 0., 10., 10.]])
    det = np.asarray([[0., 0., 10., 10.]])
    # detection of child class 1 must also score as parent class 0
    m.process(det, np.asarray([0.9]), np.asarray([1]), gt, np.asarray([1]))
    r = m.compute()
    assert r['classwise'][0] == pytest.approx(1.0)
    assert r['classwise'][1] == pytest.approx(1.0)
    assert r['mAP'] == pytest.approx(1.0)


def test_openimages_group_of_single_tp():
    from erd_tpu.evaluation.openimages_metric import OpenImagesMetric
    m = OpenImagesMetric(num_classes=2)
    grp = np.asarray([[0., 0., 100., 100.]])
    dets = np.asarray([[10., 10., 20., 20.], [30., 30., 40., 40.],
                       [200., 200., 210., 210.]])
    m.process(dets, np.asarray([0.9, 0.8, 0.7]), np.asarray([0, 0, 0]),
              grp, np.asarray([0]), group_of=np.asarray([True]))
    r = m.compute()
    # first det in the group = TP; second ignored; third = FP
    # AP: 1 TP of 1 gt found at rank 1 -> precision 1 at recall 1; the FP
    # comes after -> AP 1.0
    assert r['classwise'][0] == pytest.approx(1.0)


def test_openimages_verified_label_filtering():
    from erd_tpu.evaluation.openimages_metric import OpenImagesMetric
    m = OpenImagesMetric(num_classes=2)
    gt = np.asarray([[0., 0., 10., 10.]])
    dets = np.asarray([[0., 0., 10., 10.], [50., 50., 60., 60.]])
    # class-1 detection dropped (unverified), not an FP
    m.process(dets, np.asarray([0.9, 0.95]), np.asarray([0, 1]),
              gt, np.asarray([0]), verified_labels=[0])
    r = m.compute()
    assert r['mAP'] == pytest.approx(1.0)
    assert 1 not in r['classwise']


def test_openimages_dataset_parsing(tmp_path):
    import json as _json
    from erd_tpu.data.openimages import OpenImagesDataset
    (tmp_path / 'labels.csv').write_text('/m/01,cat\n/m/02,animal\n')
    header = ('ImageID,Source,LabelName,Confidence,XMin,XMax,YMin,YMax,'
              'IsOccluded,IsTruncated,IsGroupOf,IsDepiction,IsInside\n')
    (tmp_path / 'boxes.csv').write_text(
        header + 'img1,xclick,/m/01,1,0.1,0.5,0.2,0.6,0,0,0,0,0\n'
        'img1,xclick,/m/01,1,0.0,1.0,0.0,1.0,0,0,1,0,0\n')
    (tmp_path / 'meta.json').write_text(_json.dumps({'img1': [100, 200]}))
    hierarchy = dict(LabelName='/m/0bl9f', Subcategory=[
        dict(LabelName='/m/02', Subcategory=[dict(LabelName='/m/01')])])
    (tmp_path / 'hier.json').write_text(_json.dumps(hierarchy))
    ds = OpenImagesDataset(str(tmp_path / 'boxes.csv'),
                           str(tmp_path / 'labels.csv'),
                           hierarchy_file=str(tmp_path / 'hier.json'),
                           meta_file=str(tmp_path / 'meta.json'))
    assert ds.classes == ('cat', 'animal')
    rec = ds[0]
    np.testing.assert_allclose(rec.bboxes[0], [0.1 * 200, 0.2 * 100,
                                               0.5 * 200, 0.6 * 100])
    assert rec.group_of.tolist() == [False, True]
    # cat (0) is a descendant of animal (1)
    assert ds.relation_matrix[0, 1] and not ds.relation_matrix[1, 0]


def test_copy_paste_occlusion_and_append():
    """CopyPaste: source instances paste over the destination; a fully
    covered destination instance is dropped, an untouched one survives
    with its box intact, and pasted pixels come from the source image."""
    import numpy as np
    from erd_tpu.data.strong_aug import CopyPaste, Sample
    h = w = 64
    dst_img = np.zeros((h, w, 3), np.uint8)
    src_img = np.full((h, w, 3), 200, np.uint8)
    full = np.ones((56, 56), np.float32)
    # dst: one instance at (0,0,16,16) (will be covered), one at (40,40,60,60)
    dst = Sample(img=dst_img,
                 boxes=np.asarray([[0, 0, 16, 16], [40, 40, 60, 60]], np.float32),
                 labels=np.asarray([0, 1], np.int32),
                 ignore=np.zeros(2, bool))
    dst_masks = [full.copy(), full.copy()]
    # src: a single instance exactly covering (0,0,20,20)
    src = Sample(img=src_img,
                 boxes=np.asarray([[0, 0, 20, 20]], np.float32),
                 labels=np.asarray([2], np.int32),
                 ignore=np.zeros(1, bool))
    src_masks = [full.copy()]
    cp = CopyPaste(mask_occluded_thr=50)
    out, out_masks = cp.paste(dst, dst_masks, src, src_masks,
                              np.random.RandomState(0))
    # pasted region shows source pixels; elsewhere untouched
    assert (out.img[5, 5] == 200).all()
    assert (out.img[50, 50] == 0).all()
    # covered dst instance dropped; surviving + pasted remain
    assert len(out.boxes) == 2
    assert set(out.labels.tolist()) == {1, 2}
    surv = out.boxes[out.labels == 1][0]
    np.testing.assert_allclose(surv, [40, 40, 60, 60])
    assert len(out_masks) == 2
