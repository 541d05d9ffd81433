#!/usr/bin/env python
"""Convert Cityscapes gtFine instance annotations to COCO-format json.

Counterpart of /root/reference/tools/dataset_converters/cityscapes.py,
using erd_tpu's own RLE codec (evaluation/mask_utils.py) instead of
pycocotools + the cityscapesscripts label table (the 8 instance-evaluable
classes are inlined — same set as CITYSCAPES_CLASSES in
erd_tpu/data/extra_datasets.py).

Cityscapes instanceIds encoding: pixels >= 1000 are instances
(id // 1000 = label id); ids < 1000 are crowd regions of that label id.

Usage:
    python tools/dataset_converters/cityscapes.py <cityscapes_root> \
        -o out_dir [--nproc N]
"""
import argparse
import glob
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from erd_tpu.evaluation.mask_utils import rle_encode, rle_to_string  # noqa: E402

# cityscapesscripts labels.py: the hasInstances & ~ignoreInEval subset,
# keyed by the ORIGINAL label id (kept as COCO category_id like the
# reference converter does)
INSTANCE_LABELS = {
    24: 'person', 25: 'rider', 26: 'car', 27: 'truck', 28: 'bus',
    31: 'train', 32: 'motorcycle', 33: 'bicycle',
}


def convert_split(root, split, out_file):
    img_dir = os.path.join(root, 'leftImg8bit', split)
    gt_dir = os.path.join(root, 'gtFine', split)
    suffix = 'leftImg8bit.png'
    img_files = sorted(glob.glob(os.path.join(img_dir, '**', '*.png'),
                                 recursive=True))
    images, annotations = [], []
    ann_id = 1
    for img_id, img_file in enumerate(img_files, 1):
        assert img_file.endswith(suffix), img_file
        rel = os.path.relpath(img_file, img_dir)
        inst_file = os.path.join(
            gt_dir, rel[:-len(suffix)] + 'gtFine_instanceIds.png')
        inst = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
        if inst is None:
            print(f'missing {inst_file}', file=sys.stderr)
            continue
        h, w = inst.shape[:2]
        images.append(dict(id=img_id, width=w, height=h, file_name=rel))
        for inst_id in np.unique(inst[inst >= 24]):
            label_id = int(inst_id // 1000) if inst_id >= 1000 \
                else int(inst_id)
            if label_id not in INSTANCE_LABELS:
                continue
            mask = inst == inst_id
            ys, xs = np.nonzero(mask)
            x1, y1 = float(xs.min()), float(ys.min())
            bw = float(xs.max()) - x1 + 1
            bh = float(ys.max()) - y1 + 1
            rle = rle_encode(mask)
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=label_id,
                bbox=[x1, y1, bw, bh], area=int(mask.sum()),
                iscrowd=int(inst_id < 1000),
                segmentation={'size': [h, w],
                              'counts': rle_to_string(rle)}))
            ann_id += 1
    coco = dict(images=images, annotations=annotations,
                categories=[dict(id=i, name=n)
                            for i, n in INSTANCE_LABELS.items()])
    with open(out_file, 'w') as f:
        json.dump(coco, f)
    print(f'{out_file}: {len(images)} images, {len(annotations)} anns')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cityscapes_path')
    p.add_argument('-o', '--out-dir', default='.')
    p.add_argument('--splits', nargs='+',
                   default=['train', 'val', 'test'])
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        if not os.path.isdir(os.path.join(args.cityscapes_path,
                                          'leftImg8bit', split)):
            continue
        convert_split(args.cityscapes_path, split,
                      os.path.join(args.out_dir,
                                   f'instancesonly_filtered_gtFine_'
                                   f'{split}.json'))


if __name__ == '__main__':
    main()
