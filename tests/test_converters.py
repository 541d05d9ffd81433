"""Dataset-converter tools: VOC XML, image folders, and Cityscapes
instanceIds all convert to COCO json our CocoDataset can load."""
import importlib.util
import json
import os
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, 'tools', 'dataset_converters', f'{name}.py')
    spec = importlib.util.spec_from_file_location(f'{name}_tool', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


VOC_XML = """<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax><ymax>61</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>25</xmax><ymax>25</ymax></bndbox>
  </object>
</annotation>"""


def test_pascal_voc_converter(tmp_path):
    base = tmp_path / 'VOC2007'
    (base / 'Annotations').mkdir(parents=True)
    (base / 'ImageSets' / 'Main').mkdir(parents=True)
    (base / 'Annotations' / '000001.xml').write_text(VOC_XML)
    (base / 'ImageSets' / 'Main' / 'trainval.txt').write_text('000001\n')

    tool = _load('pascal_voc')
    out = str(tmp_path / 'voc.json')
    tool.convert(str(tmp_path), ['2007'], 'trainval', out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco['images']) == 1
    assert coco['images'][0]['width'] == 100
    assert len(coco['annotations']) == 2
    dog = next(a for a in coco['annotations'] if not a['ignore'])
    # 1-based inclusive -> 0-based xywh
    assert dog['bbox'] == [10, 20, 40, 40]
    assert coco['categories'][dog['category_id'] - 1]['name'] == 'dog'
    cat = next(a for a in coco['annotations'] if a['ignore'])
    assert cat['iscrowd'] == 1
    assert len(coco['categories']) == 20


def test_images2coco(tmp_path, monkeypatch, capsys):
    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    cv2.imwrite(str(imgs / 'a.jpg'), np.zeros((30, 40, 3), np.uint8))
    cv2.imwrite(str(imgs / 'b.png'), np.zeros((20, 25, 3), np.uint8))
    classes = tmp_path / 'classes.txt'
    classes.write_text('thing\nstuff\n')

    tool = _load('images2coco')
    monkeypatch.setattr(sys, 'argv', [
        'images2coco', str(imgs), str(classes), 'out.json',
        '-e', 'png'])
    tool.main()
    with open(tmp_path / 'out.json') as f:
        coco = json.load(f)
    assert [i['file_name'] for i in coco['images']] == ['a.jpg']
    assert coco['images'][0]['width'] == 40
    assert [c['name'] for c in coco['categories']] == ['thing', 'stuff']


def test_cityscapes_converter(tmp_path):
    root = tmp_path
    img_dir = root / 'leftImg8bit' / 'val' / 'city'
    gt_dir = root / 'gtFine' / 'val' / 'city'
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / 'x_leftImg8bit.png'),
                np.zeros((40, 60, 3), np.uint8))
    inst = np.zeros((40, 60), np.uint16)
    inst[5:15, 5:25] = 26 * 1000 + 0   # car instance
    inst[20:30, 30:50] = 24            # person crowd region (< 1000)
    inst[0:3, 0:3] = 7                 # road (stuff) — ignored
    cv2.imwrite(str(gt_dir / 'x_gtFine_instanceIds.png'), inst)

    tool = _load('cityscapes')
    out = str(tmp_path / 'cs.json')
    tool.convert_split(str(root), 'val', out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco['images']) == 1
    anns = coco['annotations']
    assert len(anns) == 2
    car = next(a for a in anns if a['category_id'] == 26)
    assert car['iscrowd'] == 0
    assert car['bbox'] == [5.0, 5.0, 20.0, 10.0]
    assert car['area'] == 200
    person = next(a for a in anns if a['category_id'] == 24)
    assert person['iscrowd'] == 1
    # RLE decodes back to the instance mask
    from erd_tpu.evaluation.mask_utils import rle_decode, string_to_rle
    rle = string_to_rle(car['segmentation']['counts'], 40, 60)
    np.testing.assert_array_equal(rle_decode(rle), inst == 26000)
