#!/usr/bin/env python
"""Build an annotation-free COCO json from a directory of images.

Counterpart of /root/reference/tools/dataset_converters/images2coco.py —
used to run inference-only evaluation/dumps over unlabeled image folders.

Usage:
    python tools/dataset_converters/images2coco.py <img_root> \
        <classes.txt> <out.json> [--exclude-extensions png bmp]
"""
import argparse
import json
import os
import sys

import cv2

IMG_EXTS = ('.jpg', '.jpeg', '.png', '.bmp', '.webp', '.tif', '.tiff')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img_path')
    p.add_argument('classes', help='text file, one class name per line')
    p.add_argument('out', help='output json (written next to img_path)')
    p.add_argument('-e', '--exclude-extensions', nargs='+', default=[])
    args = p.parse_args()

    with open(args.classes) as f:
        classes = [ln.strip() for ln in f if ln.strip()]
    excl = tuple('.' + e.lstrip('.').lower()
                 for e in args.exclude_extensions)

    images = []
    img_id = 1
    for root, _, files in sorted(os.walk(args.img_path)):
        for fn in sorted(files):
            low = fn.lower()
            if not low.endswith(IMG_EXTS) or low.endswith(excl):
                continue
            path = os.path.join(root, fn)
            img = cv2.imread(path)
            if img is None:
                print(f'skip unreadable {path}', file=sys.stderr)
                continue
            h, w = img.shape[:2]
            images.append(dict(
                id=img_id, width=w, height=h,
                file_name=os.path.relpath(path, args.img_path)))
            img_id += 1

    coco = dict(
        images=images, annotations=[],
        categories=[dict(id=i + 1, name=n)
                    for i, n in enumerate(classes)])
    out = os.path.join(os.path.dirname(os.path.abspath(args.img_path)),
                       args.out)
    with open(out, 'w') as f:
        json.dump(coco, f)
    print(f'{out}: {len(images)} images, {len(classes)} categories')


if __name__ == '__main__':
    main()
