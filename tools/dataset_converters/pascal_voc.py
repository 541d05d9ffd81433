#!/usr/bin/env python
"""Convert PASCAL VOC devkit annotations to COCO-format json.

Counterpart of /root/reference/tools/dataset_converters/pascal_voc.py, but
emitting COCO json (the interchange format every erd_tpu pipeline speaks)
instead of the mmdet pkl middle format. `difficult` objects become
`ignore: 1` / `iscrowd: 1` entries so the evaluator treats them exactly
like the VOC protocol does.

Usage:
    python tools/dataset_converters/pascal_voc.py <devkit_path> -o out_dir \
        [--split train|val|trainval|test] [--years 2007 2012]
"""
import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from erd_tpu.data.voc import VOC_CLASSES  # noqa: E402

LABEL_IDS = {name: i + 1 for i, name in enumerate(VOC_CLASSES)}


def parse_xml(xml_path):
    root = ET.parse(xml_path).getroot()
    size = root.find('size')
    w = int(size.find('width').text)
    h = int(size.find('height').text)
    objs = []
    for obj in root.findall('object'):
        name = obj.find('name').text
        if name not in LABEL_IDS:
            continue
        diff_node = obj.find('difficult')
        difficult = int(diff_node.text) if diff_node is not None else 0
        bb = obj.find('bndbox')
        # VOC coords are 1-based inclusive
        x1 = float(bb.find('xmin').text) - 1
        y1 = float(bb.find('ymin').text) - 1
        x2 = float(bb.find('xmax').text) - 1
        y2 = float(bb.find('ymax').text) - 1
        objs.append((LABEL_IDS[name], [x1, y1, x2 - x1, y2 - y1],
                     difficult))
    return w, h, objs


def convert(devkit, years, split, out_file):
    images, annotations = [], []
    ann_id = 1
    img_id = 1
    for year in years:
        base = os.path.join(devkit, f'VOC{year}')
        list_file = os.path.join(base, 'ImageSets', 'Main',
                                 f'{split}.txt')
        if not os.path.exists(list_file):
            continue
        with open(list_file) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        for name in names:
            xml_path = os.path.join(base, 'Annotations', f'{name}.xml')
            w, h, objs = parse_xml(xml_path)
            images.append(dict(
                id=img_id, width=w, height=h,
                file_name=f'VOC{year}/JPEGImages/{name}.jpg'))
            for cat, xywh, difficult in objs:
                annotations.append(dict(
                    id=ann_id, image_id=img_id, category_id=cat,
                    bbox=[round(v, 2) for v in xywh],
                    area=round(xywh[2] * xywh[3], 2),
                    iscrowd=difficult, ignore=difficult))
                ann_id += 1
            img_id += 1
    coco = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i, name=n) for n, i in LABEL_IDS.items()])
    os.makedirs(os.path.dirname(out_file) or '.', exist_ok=True)
    with open(out_file, 'w') as f:
        json.dump(coco, f)
    print(f'{out_file}: {len(images)} images, {len(annotations)} anns')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('devkit_path')
    p.add_argument('-o', '--out-dir', default='.')
    p.add_argument('--split', default='trainval')
    p.add_argument('--years', nargs='+', default=['2007', '2012'])
    args = p.parse_args()
    out = os.path.join(args.out_dir,
                       f'voc_{"_".join(args.years)}_{args.split}.json')
    convert(args.devkit_path, args.years, args.split, out)


if __name__ == '__main__':
    main()
